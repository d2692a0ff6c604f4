"""Test config: force JAX onto a virtual 8-device CPU mesh (SURVEY.md §4 test plan).

Must run before jax is imported anywhere — pytest imports conftest first.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
            "__version__ = '0.23.0'\nfrom . import ops\n"
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
    for p in (str(stub_root), str(REFERENCE)):
        if p not in sys.path:
            sys.path.insert(0, p)
