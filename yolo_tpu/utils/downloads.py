"""Download / archive utilities (ref: ultralytics/utils/downloads.py
is_url:45, delete_dsstore:72, zip_directory:95, unzip_file:137,
check_disk_space:206, safe_download:279, download:490, attempt_download_asset:434).

Network transfer uses stdlib urllib with retries; everything else (zip,
disk-space, asset resolution) works fully offline. In a zero-egress
deployment, asset fetches fail with an actionable message instead of hanging.
"""

from __future__ import annotations

import shutil
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path
from zipfile import ZIP_DEFLATED, ZipFile, is_zipfile

from yolo_tpu.utils import LOGGER
from yolo_tpu.utils.tqdm import TQDM


def is_url(url, check: bool = False) -> bool:
    """True if `url` parses as an http(s)/file URL; with check=True, also HEADs it."""
    try:
        url = str(url)
        result = urllib.parse.urlparse(url)
        if not (result.scheme and result.netloc):
            return False
        if check:
            with urllib.request.urlopen(url, timeout=10) as resp:
                return resp.status == 200
        return True
    except Exception:
        return False


def delete_dsstore(path, files_to_delete=(".DS_Store", "__MACOSX")) -> None:
    """Remove macOS filesystem droppings before zipping/sharing a directory."""
    for pattern in files_to_delete:
        for f in Path(path).rglob(pattern):
            LOGGER.info(f"deleting {f}")
            shutil.rmtree(f) if f.is_dir() else f.unlink()


def zip_directory(directory, compress: bool = True, exclude=(".DS_Store", "__MACOSX"),
                  progress: bool = True) -> Path:
    """Zip `directory` into `<directory>.zip` (contents nested under its name)."""
    delete_dsstore(directory)
    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"directory '{directory}' does not exist")

    files = [f for f in directory.rglob("*") if f.is_file()
             and all(x not in f.name for x in exclude)]
    zip_file = directory.with_suffix(".zip")
    with ZipFile(zip_file, "w", ZIP_DEFLATED if compress else 0) as zf:
        for f in TQDM(files, desc=f"zipping {directory} to {zip_file}", disable=not progress):
            zf.write(f, f.relative_to(directory.parent))
    return zip_file


def unzip_file(file, path=None, exclude=(".DS_Store", "__MACOSX"),
               exist_ok: bool = False, progress: bool = True) -> Path:
    """Unzip into `path` (default: alongside the zip), nesting loose archives
    under a stem-named folder the way the reference does."""
    if path is None:
        path = Path(file).parent
    file = Path(file)

    with ZipFile(file) as zf:
        names = [f for f in zf.namelist() if all(x not in f for x in exclude)]
        top_levels = {Path(f).parts[0] for f in names}

        if len(top_levels) == 1:
            # already under one folder — extract in place, return that folder
            extract_path = Path(path)
            path = Path(path) / next(iter(top_levels))
        else:
            # loose members — nest them under a stem-named folder
            path = extract_path = Path(path) / file.stem

        if path.exists() and any(path.iterdir()) and not exist_ok:
            LOGGER.warning(f"skipping {file} unzip — destination {path} is not empty")
            return path

        for f in TQDM(names, desc=f"unzipping {file} to {Path(path).resolve()}", disable=not progress):
            if ".." in Path(f).parts:
                LOGGER.warning(f"skipping potentially unsafe member {f}")
                continue
            zf.extract(f, extract_path)
    return path


def check_disk_space(url_size_bytes: int, path=Path.cwd(), sf: float = 1.5,
                     hard: bool = True) -> bool:
    """Require sf× the payload in free disk; raise (hard) or warn otherwise."""
    total, used, free = shutil.disk_usage(path)
    need = url_size_bytes * sf
    if need < free:
        return True
    msg = (f"insufficient disk space: need {need / (1 << 30):.1f} GB (x{sf}), "
           f"only {free / (1 << 30):.1f} GB free at {path}")
    if hard:
        raise MemoryError(msg)
    LOGGER.warning(msg)
    return False


def safe_download(url, file=None, dir=None, unzip: bool = True, delete: bool = False,
                  retry: int = 3, min_bytes: float = 1.0, exist_ok: bool = False,
                  progress: bool = True) -> Path:
    """Download `url` with retries + size check; optionally unzip.

    Returns the downloaded file path (or the unzip directory when unzipped).
    """
    f = Path(dir or ".") / (file or url2file(url))
    if f.is_file():
        LOGGER.info(f"found {f} locally, skipping download")
    else:
        f.parent.mkdir(parents=True, exist_ok=True)
        desc = f"downloading {url} to '{f}'"
        last_err = None
        for attempt in range(retry + 1):
            try:
                with urllib.request.urlopen(url, timeout=30) as resp:
                    total = int(resp.headers.get("Content-Length", 0))
                    if total:
                        check_disk_space(total, path=f.parent)
                    with TQDM(total=total or None, desc=desc, disable=not progress,
                              unit="B", unit_scale=True) as bar, open(f, "wb") as out:
                        while True:
                            chunk = resp.read(1 << 20)
                            if not chunk:
                                break
                            out.write(chunk)
                            bar.update(len(chunk))
                if f.stat().st_size > min_bytes:
                    break
                f.unlink(missing_ok=True)
                last_err = RuntimeError(f"download too small (< {min_bytes} bytes)")
            except (urllib.error.URLError, OSError, RuntimeError) as e:
                last_err = e
                f.unlink(missing_ok=True)
                if attempt < retry:
                    LOGGER.warning(f"download attempt {attempt + 1} failed ({e}), retrying...")
        else:
            raise ConnectionError(
                f"failed to download {url} after {retry + 1} attempts — in a "
                f"zero-egress deployment place the file at '{f}' manually"
            ) from last_err

    if unzip and f.exists() and f.suffix in ("", ".zip", ".tar", ".gz"):
        if is_zipfile(f):
            out_dir = unzip_file(f, path=dir or f.parent, exist_ok=exist_ok, progress=progress)
            if delete:
                f.unlink()
            return out_dir
    return f


def url2file(url) -> str:
    """Filename part of a URL (query string stripped, %XX unescaped)."""
    return Path(urllib.parse.unquote(str(url))).name.split("?")[0]


def download(url, dir=Path.cwd(), unzip: bool = True, delete: bool = False,
             threads: int = 1, retry: int = 3, exist_ok: bool = False) -> None:
    """Download one URL or a list, optionally with a small thread pool."""
    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            list(pool.map(lambda u: safe_download(u, dir=dir, unzip=unzip, delete=delete,
                                                  retry=retry, exist_ok=exist_ok), urls))
    else:
        for u in urls:
            safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry, exist_ok=exist_ok)


def attempt_download_asset(file, repo: str = "ultralytics/assets",
                           release: str = "latest") -> str:
    """Resolve a model/asset name to a local file, downloading from a GitHub
    release when the environment has egress. Local files win; failures carry
    the offline instruction instead of a stack of socket errors."""
    file = Path(str(file).strip().strip("'\""))
    if file.exists():
        return str(file)
    url = f"https://github.com/{repo}/releases/{'latest/download' if release == 'latest' else f'download/{release}'}/{file.name}"
    return str(safe_download(url, file=file.name, dir=file.parent or Path("."), unzip=False))
