"""Environment report (counterpart of fastvideo/utils/env_utils.py).

``python -m mixgrpo_tpu.utils.env`` prints versions, platform, and the
device/mesh topology visible to this process.
"""

from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
    }
    for mod in ("jax", "jaxlib", "flax", "optax", "numpy", "transformers"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "unknown")
        except Exception:
            info[mod] = "not installed"
    try:
        import jax

        info["process_index"] = jax.process_index()
        info["process_count"] = jax.process_count()
        info["devices"] = [str(d) for d in jax.devices()]
        info["default_backend"] = jax.default_backend()
    except Exception as e:
        info["devices"] = f"unavailable: {e}"
    return info


def main():
    for k, v in collect_env().items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
