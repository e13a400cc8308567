"""One-shot TPU probe: the fp32 fused qkv BACKWARD at the shape whose th=16
band overflowed scoped VMEM (16.72M > 16M, [3,128,128,48]->192). Verifies the
5/8-scaled budget's th=8 band compiles and runs on the chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_fp32_band.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from rcot_tpu.ops.pallas_fused import _bwd_th, fused_dwconv


def main():
    th = _bwd_th(128, 128, 192, 4)
    print("fp32 th at [3,128,128,48]->192:", th)
    assert th == 8, th

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 128, 128, 48)), jnp.float32)
    w_in = jnp.asarray(rng.standard_normal((48, 192)) * 0.05, jnp.float32)
    dwk = jnp.asarray(rng.standard_normal((3, 3, 192)) * 0.05, jnp.float32)

    def loss(x, w_in, dwk):
        return jnp.sum(fused_dwconv(x, w_in, dwk, None, False, False) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, w_in, dwk)
    jax.block_until_ready(g)
    for name, a in zip(("dx", "dw_in", "ddwk"), g):
        assert bool(jnp.isfinite(a).all()), name
        print(name, a.shape, "finite, |mean|=", float(jnp.abs(a).mean()))
    print("fp32 th=8 band: compiles and runs on", jax.devices()[0])


if __name__ == "__main__":
    main()
