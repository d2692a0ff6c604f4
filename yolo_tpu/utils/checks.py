"""Environment / argument checks (ref: ultralytics/utils/checks.py).

The reference's AMP fwd/bwd sanity check (check_amp:735) maps to a bf16-vs-f32
decode comparison; version/requirement checks reduce to import probes since the
TPU stack is a fixed image.
"""

from __future__ import annotations

import math
import platform
import sys

from yolo_tpu.utils import LOGGER


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, floor: int = 0):
    """Round image size(s) up to a stride multiple (ref: check_imgsz:117)."""
    if isinstance(imgsz, int):
        imgsz = [imgsz]
    sz = [max(int(math.ceil(x / stride) * stride), floor) for x in imgsz]
    if sz != list(imgsz):
        LOGGER.warning(f"imgsz {imgsz} not a multiple of stride {stride}, adjusted to {sz}")
    return sz[0] if min_dim == 1 and len(sz) == 1 else sz


def check_version(current: str, required: str = "") -> bool:
    """Loose semver comparison: required like '>=1.0,<3.0'."""
    if not required:
        return True

    def parse(v):
        return tuple(int(x) for x in v.split(".")[:3] if x.isdigit())

    def pad(a, b):
        """Equal-length tuples — '1' vs '1.0' must compare equal, but (1,) < (1, 0)."""
        n = max(len(a), len(b))
        return a + (0,) * (n - len(a)), b + (0,) * (n - len(b))

    cur0 = parse(current)
    for clause in required.replace(" ", "").split(","):
        for op in (">=", "<=", "==", "!=", ">", "<"):
            if clause.startswith(op):
                cur, ref = pad(cur0, parse(clause[len(op) :]))
                ok = {
                    ">=": cur >= ref, "<=": cur <= ref, "==": cur == ref,
                    "!=": cur != ref, ">": cur > ref, "<": cur < ref,
                }[op]
                if not ok:
                    return False
                break
    return True


def check_amp(model, params) -> bool:
    """bf16-vs-f32 decode agreement on a dummy input (ref: check_amp:735)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y32 = np.asarray(jax.jit(lambda p, v: model.predict(p, v, dtype=jnp.float32))(params, x))
    y16 = np.asarray(jax.jit(lambda p, v: model.predict(p, v, dtype=jnp.bfloat16))(params, x))
    # boxes within 2 px, scores within 0.05 on an untrained net is plenty
    ok = np.allclose(y32[:, :4], y16[:, :4], atol=2.0) and np.allclose(y32[:, 4:], y16[:, 4:], atol=0.05)
    if not ok:
        LOGGER.warning("bf16 check failed — training will fall back to float32")
    return bool(ok)


def collect_system_info() -> str:
    """One-line environment summary for `yolo checks`."""
    lines = [f"python {sys.version.split()[0]} on {platform.platform()}"]
    try:
        import jax

        lines.append(f"jax {jax.__version__}; devices: {[str(d) for d in jax.devices()]}")
    except Exception as e:
        lines.append(f"jax unavailable: {e}")
    for pkg in ("numpy", "cv2", "scipy", "optax", "orbax.checkpoint"):
        try:
            mod = __import__(pkg)
            lines.append(f"{pkg} {getattr(mod, '__version__', 'ok')}")
        except ImportError:
            lines.append(f"{pkg} MISSING")
    return "\n".join(lines)
