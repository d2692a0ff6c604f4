"""Test config: force JAX onto a virtual 8-device CPU mesh (SURVEY.md §4 test plan).

Must run before jax is imported anywhere — pytest imports conftest first.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: shell exports axon (real TPU)
# isolate persisted user settings (runs_dir/datasets_dir/api_key) from the
# machine's real ~/.config — tests must see fresh relative defaults
os.environ.setdefault("YOLO_TPU_CONFIG_DIR", "/tmp/yolo_tpu_test_config")
# trainer-level bf16 sanity run costs 2 extra full-model compiles per training
# test — covered once, explicitly, in test_checks.py instead
os.environ.setdefault("YOLO_TPU_SKIP_AMP_CHECK", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The machine's sitecustomize imports jax at interpreter boot (axon TPU tunnel),
# so the env vars above are too late for jax.config — update it directly.
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip XLA recompilation entirely
jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_TEST_CACHE", "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    """The public reference repo (read-only) doubles as a numeric test oracle."""
    return (REFERENCE / "ultralytics" / "__init__.py").exists()


def add_reference_to_path():
    """Put the reference checkout on sys.path, with a stub torchvision dist
    (metadata + pure-torch ops.nms) since torchvision isn't installed here."""
    stub_root = Path("/tmp/tvstub")
    dist = stub_root / "torchvision-0.23.0.dist-info"
    pkg = stub_root / "torchvision"
    if not dist.exists():
        dist.mkdir(parents=True, exist_ok=True)
        (dist / "METADATA").write_text("Metadata-Version: 2.1\nName: torchvision\nVersion: 0.23.0\n")
        (dist / "RECORD").write_text("")
        pkg.mkdir(parents=True, exist_ok=True)
        (pkg / "__init__.py").write_text(
            "__version__ = '0.23.0'\nfrom . import io, ops, transforms\n"
        )
        (pkg / "ops.py").write_text(
            "import torch\n"
            "def nms(boxes, scores, iou_threshold):\n"
            "    order = scores.argsort(descending=True)\n"
            "    keep = []\n"
            "    sup = torch.zeros(len(boxes), dtype=torch.bool)\n"
            "    areas = (boxes[:,2]-boxes[:,0]).clamp(min=0)*(boxes[:,3]-boxes[:,1]).clamp(min=0)\n"
            "    for i in order.tolist():\n"
            "        if sup[i]: continue\n"
            "        keep.append(i)\n"
            "        xx1 = torch.maximum(boxes[i,0], boxes[:,0]); yy1 = torch.maximum(boxes[i,1], boxes[:,1])\n"
            "        xx2 = torch.minimum(boxes[i,2], boxes[:,2]); yy2 = torch.minimum(boxes[i,3], boxes[:,3])\n"
            "        inter = (xx2-xx1).clamp(min=0)*(yy2-yy1).clamp(min=0)\n"
            "        iou = inter/(areas[i]+areas-inter+1e-7)\n"
            "        sup |= iou > iou_threshold\n"
            "    return torch.tensor(keep, dtype=torch.long)\n"
        )
        # transformers probes torchvision via importlib.metadata and then
        # imports torchvision.{transforms,io} at import time — give the stub
        # enough surface that the probe doesn't explode
        (pkg / "io.py").write_text(
            "class VideoReader:\n"
            "    def __init__(self, *a, **k):\n"
            "        raise RuntimeError('stub torchvision has no video io')\n"
            "def read_image(*a, **k):\n"
            "    raise RuntimeError('stub torchvision has no image io')\n"
            "def read_video(*a, **k):\n"
            "    raise RuntimeError('stub torchvision has no video io')\n"
        )
        (pkg / "transforms.py").write_text(
            "from enum import Enum\n"
            "class InterpolationMode(str, Enum):\n"
            "    NEAREST = 'nearest'\n"
            "    NEAREST_EXACT = 'nearest-exact'\n"
            "    BILINEAR = 'bilinear'\n"
            "    BICUBIC = 'bicubic'\n"
            "    BOX = 'box'\n"
            "    HAMMING = 'hamming'\n"
            "    LANCZOS = 'lanczos'\n"
        )
    lap_stub = stub_root / "lap.py"
    if not lap_stub.exists():
        lap_stub.write_text(
            "'''scipy-backed emulation of lap.lapjv for the reference tracker tests.'''\n"
            "import numpy as np\n"
            "import scipy.optimize\n"
            "__version__ = '0.5.12'\n"
            "def lapjv(cost, extend_cost=False, cost_limit=np.inf, return_cost=True):\n"
            "    cost = np.asarray(cost, dtype=float)\n"
            "    n, m = cost.shape\n"
            "    L = cost_limit if np.isfinite(cost_limit) else 1e9\n"
            "    BIG = 1e12\n"
            "    # square augmentation: dummy col/row per real row/col at cost L\n"
            "    C = np.full((n + m, n + m), 0.0)\n"
            "    C[:n, :m] = np.where(cost <= L, cost, BIG)\n"
            "    C[:n, m:] = np.where(np.eye(n, dtype=bool), L, BIG)\n"
            "    C[n:, :m] = np.where(np.eye(m, dtype=bool), L, BIG)\n"
            "    rows, cols = scipy.optimize.linear_sum_assignment(C)\n"
            "    x = np.full(n, -1, dtype=int)\n"
            "    y = np.full(m, -1, dtype=int)\n"
            "    total = 0.0\n"
            "    for r, c in zip(rows, cols):\n"
            "        if r < n and c < m and cost[r, c] <= L:\n"
            "            x[r] = c\n"
            "            y[c] = r\n"
            "            total += cost[r, c]\n"
            "    if return_cost:\n"
            "        return total, x, y\n"
            "    return x, y\n"
        )
    polars_stub = stub_root / "polars.py"
    if not polars_stub.exists():
        polars_stub.write_text(
            "'''csv-backed emulation of the one polars call the reference trainer\n"
            "makes (read_csv(...).to_dict(as_series=False), trainer.py:543-547).'''\n"
            "import csv\n"
            "__version__ = '1.0.0'\n"
            "class _Frame:\n"
            "    def __init__(self, rows, fields):\n"
            "        self.rows, self.fields = rows, fields\n"
            "    def to_dict(self, as_series=True):\n"
            "        def conv(v):\n"
            "            try:\n"
            "                return int(v)\n"
            "            except ValueError:\n"
            "                try:\n"
            "                    return float(v)\n"
            "                except ValueError:\n"
            "                    return v\n"
            "        return {f: [conv(r[f]) for r in self.rows] for f in self.fields}\n"
            "def read_csv(path, infer_schema_length=None):\n"
            "    with open(path, newline='') as f:\n"
            "        reader = csv.DictReader(f)\n"
            "        rows = list(reader)\n"
            "        return _Frame(rows, reader.fieldnames or [])\n"
        )
    oracle = stub_root / "grayscale_tracking_system_oracle.py"
    oracle_src = (
        "'''Thin shim exposing reference grayscale methods as pure functions\n"
        "(the reference class loads a YOLO model in __init__, so we bypass it).'''\n"
        "import importlib.util\n"
        "_spec = importlib.util.spec_from_file_location(\n"
        "    'gts_ref', '/root/reference/Grayscale-Tracking/grayscale_tracking_system.py')\n"
        "_mod = importlib.util.module_from_spec(_spec)\n"
        "_spec.loader.exec_module(_mod)\n"
        "def _bare(roi_size=40, search_radius=50, template=None):\n"
        "    t = _mod.GrayscaleTracker.__new__(_mod.GrayscaleTracker)\n"
        "    t.roi_size = roi_size\n"
        "    t.search_radius = search_radius\n"
        "    t.local_grayscale_template = template\n"
        "    return t\n"
        "def ref_gradient_magnitude_prediction(frame, last_center, roi_size=40):\n"
        "    return _mod.GrayscaleTracker.gradient_magnitude_prediction(\n"
        "        _bare(roi_size), frame, last_center)\n"
        "def ref_grayscale_similarity_search(frame, template, last_center, search_radius=50):\n"
        "    return _mod.GrayscaleTracker.grayscale_similarity_search(\n"
        "        _bare(template=template, search_radius=search_radius), frame, last_center)\n"
    )
    if not oracle.exists() or oracle.read_text() != oracle_src:
        oracle.write_text(oracle_src)
    for p in (str(stub_root), str(REFERENCE)):
        if p not in sys.path:
            sys.path.insert(0, p)


# --------------------------------------------------------------------------- #
# default-fast suite: heavy torch-parity / training modules are opt-in via
# --slow (the reference uses the same conftest pattern, ref tests/conftest.py
# :10-25). Default run stays < 5 min; CI's nightly job passes --slow.
# --------------------------------------------------------------------------- #
import pytest  # noqa: E402

SLOW_MODULES = {
    "test_classify",        # full classification training loop
    "test_model",           # torch .pt import + forward numeric parity
    "test_model_families",  # v3/v5/v6/v8/11/12 torch parity sweep
    "test_pose_obb",        # pose/OBB loss+validator parity
    "test_profilers",       # trace/flops/autobatch (compiles several graphs)
    "test_rtdetr_train",    # DETR loss + Hungarian parity training steps
    "test_sam",             # SAM/MobileSAM/SAM2 encoder-decoder parity
    "test_sam2_video",      # 10-frame video propagation parity
    "test_segment",         # mask training + seg mAP
    "test_train",           # detect trainer end-to-end + orbax resume
    "test_val_parity",      # reference-validator DetMetrics parity on shared .pt
    "test_text_model",      # CLIP tower parity vs transformers
    "test_world",           # YOLO-World parity + set_classes
    "test_yoloe",           # YOLOE parity + prompts
}


def pytest_addoption(parser):
    parser.addoption("--slow", action="store_true", default=False,
                     help="also run the heavy torch-parity / training modules")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow suite — opt in with --slow")
    for item in items:
        if Path(str(item.fspath)).stem in SLOW_MODULES or item.get_closest_marker("heavy"):
            item.add_marker(skip)
