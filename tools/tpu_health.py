"""TPU attach health check with a hard bound (exit 0 healthy / 1 not).

The sandbox reaches its TPU through a host-spawned loopback relay; when the
relay dies, `jax.devices()` blocks forever in an attach-retry loop instead
of raising (observed 2026-08-17: mid-epoch futex wedge, then every new
process hung). This probes in a bounded SUBPROCESS so the caller can decide
(fall back to CPU, queue work, alert) instead of wedging too.

Usage: python tools/tpu_health.py [timeout_sec]
"""

import subprocess
import sys

_CHILD = """
import jax
import jax.numpy as jnp
d = jax.devices()
x = float(jnp.ones(8).sum())
assert x == 8.0, x
print(f"tpu-ok {d[0]}")
"""


def healthy(timeout: float = 60.0) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD], timeout=timeout,
            capture_output=True, text=True, start_new_session=True)
    except subprocess.TimeoutExpired:
        print(f"tpu-unhealthy: attach exceeded {timeout:.0f}s "
              "(dead relay wedges, it does not raise)", file=sys.stderr)
        return False
    if out.returncode == 0 and "tpu-ok" in out.stdout:
        print(out.stdout.strip())
        return True
    print(f"tpu-unhealthy: rc={out.returncode} "
          f"{(out.stderr or out.stdout)[-300:]}", file=sys.stderr)
    return False


if __name__ == "__main__":
    t = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    sys.exit(0 if healthy(t) else 1)
