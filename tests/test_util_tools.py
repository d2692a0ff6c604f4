"""Utility tooling: git metadata, unicode-safe cv2 IO, download/archive toolkit.

Covers yolo_tpu/utils/{git,patches,downloads}.py (ref counterparts:
ultralytics/utils/{git,patches,downloads}.py). Download tests run against a
local stdlib HTTP server — no egress needed.
"""

from __future__ import annotations

import http.server
import subprocess
import threading
from pathlib import Path

import numpy as np
import pytest


# ---- git ----------------------------------------------------------------------

def test_gitrepo_reads_this_repo():
    from yolo_tpu.utils.git import GitRepo

    repo = GitRepo(Path(__file__).resolve())
    assert repo.is_repo
    assert repo.commit and len(repo.commit) == 40
    # branch may be detached in CI; when present it matches git's own answer
    try:
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=repo.root,
                              capture_output=True, text=True, timeout=10)
        if head.returncode == 0:
            assert repo.commit == head.stdout.strip()
    except (OSError, subprocess.TimeoutExpired):
        pass


def test_gitrepo_outside_repo(tmp_path):
    from yolo_tpu.utils.git import GitRepo

    repo = GitRepo(tmp_path)
    assert not repo.is_repo
    assert repo.branch is None and repo.commit is None and repo.origin is None


def test_gitrepo_synthetic(tmp_path):
    from yolo_tpu.utils.git import GitRepo

    git = tmp_path / ".git"
    (git / "refs" / "heads").mkdir(parents=True)
    (git / "HEAD").write_text("ref: refs/heads/feature/x\n")
    (git / "refs" / "heads" / "feature").mkdir()
    sha = "a" * 40
    (git / "refs" / "heads" / "feature" / "x").write_text(sha + "\n")
    (git / "config").write_text('[remote "origin"]\n\turl = https://example.com/o/r.git\n')

    repo = GitRepo(tmp_path / "subdir_that_does_not_exist_yet")
    # start from a child path that doesn't exist — root discovery walks parents
    repo = GitRepo(tmp_path)
    assert repo.branch == "feature/x"
    assert repo.commit == sha
    assert repo.origin == "https://example.com/o/r.git"


def test_gitrepo_packed_refs(tmp_path):
    from yolo_tpu.utils.git import GitRepo

    git = tmp_path / ".git"
    git.mkdir()
    (git / "HEAD").write_text("ref: refs/heads/main\n")
    sha = "b" * 40
    (git / "packed-refs").write_text(f"# pack-refs\n{sha} refs/heads/main\n")
    assert GitRepo(tmp_path).commit == sha


# ---- patches -------------------------------------------------------------------

def test_imread_imwrite_unicode(tmp_path):
    from yolo_tpu.utils.patches import imread, imwrite

    img = np.random.default_rng(0).integers(0, 255, (16, 24, 3), np.uint8)
    p = tmp_path / "图像_tëst.png"
    assert imwrite(str(p), img)
    back = imread(str(p))
    np.testing.assert_array_equal(back, img)

    assert imread(str(tmp_path / "missing.png")) is None
    assert not imwrite(str(tmp_path / "nodir" / "x.unknownext"), img)


# ---- downloads -----------------------------------------------------------------

def test_is_url():
    from yolo_tpu.utils.downloads import is_url, url2file

    assert is_url("https://example.com/a.zip")
    assert not is_url("not a url")
    assert not is_url("/local/path.zip")
    assert url2file("https://x.com/dir/m%20odel.pt?v=1") == "m odel.pt"


def test_zip_unzip_roundtrip(tmp_path):
    from yolo_tpu.utils.downloads import unzip_file, zip_directory

    src = tmp_path / "bundle"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("beta")
    (src / ".DS_Store").write_text("junk")

    z = zip_directory(src, progress=False)
    assert z == src.with_suffix(".zip") and z.exists()

    out_root = tmp_path / "out"
    out_root.mkdir()
    dest = unzip_file(z, path=out_root, progress=False)
    assert (dest / "a.txt").read_text() == "alpha"
    assert (dest / "sub" / "b.txt").read_text() == "beta"
    assert not (dest / ".DS_Store").exists()


def test_unzip_skips_traversal(tmp_path):
    import zipfile

    from yolo_tpu.utils.downloads import unzip_file

    z = tmp_path / "evil.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("ok/fine.txt", "fine")
        zf.writestr("../escape.txt", "evil")
    unzip_file(z, path=tmp_path / "out", progress=False)
    assert not (tmp_path / "escape.txt").exists()


@pytest.fixture()
def local_http(tmp_path_factory):
    root = tmp_path_factory.mktemp("www")
    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(*a, directory=str(root), **k)
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_safe_download_and_retry(local_http, tmp_path):
    from yolo_tpu.utils.downloads import download, safe_download

    root, base = local_http
    payload = b"x" * 4096
    (root / "weights.bin").write_bytes(payload)

    out = safe_download(f"{base}/weights.bin", dir=tmp_path, progress=False)
    assert out.read_bytes() == payload

    # second call hits the local-file fast path (no server dependency)
    out2 = safe_download(f"{base}/weights.bin", dir=tmp_path, progress=False)
    assert out2 == out

    # missing file exhausts retries with an actionable offline hint
    with pytest.raises(ConnectionError, match="zero-egress"):
        safe_download(f"{base}/missing.bin", dir=tmp_path, retry=1, progress=False)

    # list + threads entrypoint
    (root / "a.bin").write_bytes(b"a" * 10)
    (root / "b.bin").write_bytes(b"b" * 10)
    download([f"{base}/a.bin", f"{base}/b.bin"], dir=tmp_path / "multi", threads=2)
    assert (tmp_path / "multi" / "a.bin").exists() and (tmp_path / "multi" / "b.bin").exists()


def test_safe_download_unzips(local_http, tmp_path):
    import zipfile

    from yolo_tpu.utils.downloads import safe_download

    root, base = local_http
    z = root / "data.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("data/x.txt", "hello")

    dest = safe_download(f"{base}/data.zip", dir=tmp_path, unzip=True, progress=False)
    assert (Path(dest) / "x.txt").read_text() == "hello"


def test_attempt_download_asset_local(tmp_path):
    from yolo_tpu.utils.downloads import attempt_download_asset

    f = tmp_path / "model.npz"
    f.write_bytes(b"weights")
    assert attempt_download_asset(str(f)) == str(f)
