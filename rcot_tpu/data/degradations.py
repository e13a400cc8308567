"""Device-resident augmentation + degradation synthesis (jit'd preproc stage).

The reference does all of this per-sample in DataLoader workers with numpy/PIL
(reference: util/degradation_utils.py:21-27, util/image_utils.py:133-182).
Here the host only decodes and crops; the batched augment + noise synthesis
runs on-device inside one XLA program, so the TPU never waits on Python for
the math (SURVEY.md §7 hard-part #7).

Pinned semantics:
- Gaussian noise: clip(x_uint8 + N(0,1)*sigma, 0, 255) then uint8 truncation
  (numpy astype truncates toward zero) then /255
  (reference: util/degradation_utils.py:24-25, dataset ToTensor).
  sigma per de_id: {0: 15, 1: 25, 2: 50}.
- Dihedral augmentation: mode uniform in 1..7 — the reference NEVER applies
  the identity (SURVEY.md §2.2 #10; util/image_utils.py:177-182). Paired
  samples share one mode (util/dataset_utils.py:262).
  Mode map (util/image_utils.py:133-163): 1 flipud; 2 rot90; 3 rot90+flipud;
  4 rot180; 5 rot180+flipud; 6 rot270; 7 rot270+flipud.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# sigma per denoise de_id (reference: util/degradation_utils.py:29-38).
# numpy, NOT jnp: a module-scope jnp.array would initialize the JAX backend
# as an import side effect — seizing the (single-tenancy) TPU and breaking
# jax.distributed.initialize ordering for any library user who imports
# before calling it. It is converted at trace time where used.
_SIGMAS = np.array([15.0, 25.0, 50.0, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32)


def dihedral(x: jax.Array, mode: jax.Array) -> jax.Array:
    """Apply dihedral-8 transform `mode` (0..7) to one HWC image (H == W)."""
    branches = [
        lambda im: im,
        lambda im: jnp.flipud(im),
        lambda im: jnp.rot90(im),
        lambda im: jnp.flipud(jnp.rot90(im)),
        lambda im: jnp.rot90(im, k=2),
        lambda im: jnp.flipud(jnp.rot90(im, k=2)),
        lambda im: jnp.rot90(im, k=3),
        lambda im: jnp.flipud(jnp.rot90(im, k=3)),
    ]
    return jax.lax.switch(mode, branches, x)


def augment_and_degrade(key: jax.Array, clean: jax.Array, degraded: jax.Array,
                        de_id: jax.Array, *, identity_augment_allowed: bool = False,
                        out_dtype=jnp.float32):
    """Batched device preproc.

    clean, degraded: (B, P, P, C) uint8 host patches (degraded == clean for
    denoise tasks; the noise is synthesized here). de_id: (B,) int32.
    Returns (degraded, clean) in [0, 1] float `out_dtype`.
    """
    b = clean.shape[0]
    k_mode, k_noise = jax.random.split(key)
    lo = 0 if identity_augment_allowed else 1
    modes = jax.random.randint(k_mode, (b,), lo, 8)

    clean = jax.vmap(dihedral)(clean, modes)
    degraded = jax.vmap(dihedral)(degraded, modes)

    sigma = jnp.asarray(_SIGMAS)[jnp.clip(de_id, 0, 7)][:, None, None, None]
    noise = jax.random.normal(k_noise, clean.shape, jnp.float32)
    noisy = jnp.clip(clean.astype(jnp.float32) + noise * sigma, 0.0, 255.0)
    # uint8 truncation parity with numpy .astype(np.uint8).
    noisy = jnp.floor(noisy)
    is_noise = (de_id < 3)[:, None, None, None]
    degraded = jnp.where(is_noise, noisy, degraded.astype(jnp.float32))

    return (degraded / 255.0).astype(out_dtype), (clean.astype(jnp.float32) / 255.0).astype(out_dtype)
