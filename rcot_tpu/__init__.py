"""rcot-tpu: a TPU-native (JAX/XLA/Pallas/pjit) image-restoration framework.

Re-designed from the behavioral spec of xl-tang3/RCOT (ICML 2024, "Residual-
Conditioned Optimal Transport"): a two-pass Restormer transport map trained by
adversarial minimax against an OT potential (WGAN-GP critic) with a Fourier
residual-guided transport cost, across denoise/derain/dehaze/deblur/lowlight/SR
tasks.

This is not a port: activations are NHWC, the model is a pure function over a
param pytree, both restoration passes + the transport cost compile into single
XLA programs, the minimax alternation is two jitted steps with donated buffers,
data parallelism is a `jax.sharding.Mesh` axis with psum'd gradients, and the
hot ops have Pallas TPU kernels with pure-jnp reference twins.

Quick API:

    from rcot_tpu import Config, get_preset, Trainer
    from rcot_tpu.models.restormer import init_tnet, apply_tnet
    from rcot_tpu.models.inference import make_restorer
"""

__version__ = "0.1.0"

from .utils.config import (Config, CriticConfig, DataConfig,  # noqa: F401
                           EvalConfig, ModelConfig, TrainConfig, get_preset)


def __getattr__(name):
    # lazy heavy imports so `import rcot_tpu` stays light
    if name == "Trainer":
        from .train.trainer import Trainer
        return Trainer
    if name == "TrainState":
        from .train.steps import TrainState
        return TrainState
    raise AttributeError(name)
