"""Typed configuration for the rcot-tpu framework.

Replaces the reference's per-CLI argparse recipes (reference: trainer.py:22-58,
tester.py:13-31, tester_noise.py:13-40) with frozen dataclasses plus named
presets mirroring the four README training commands (reference: README.md:99-115).
CLI entry points overlay flag overrides on top of a preset.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

# Degradation id scheme (reference: util/dataset_utils.py:40).
DE_DICT: Dict[str, int] = {
    "denoise_15": 0,
    "denoise_25": 1,
    "denoise_50": 2,
    "derain": 3,
    "dehaze": 4,
    "deblur": 5,
    "lowlight": 6,
    "single": 7,
}
# Collapsed id scheme when noise is one category (reference: util/dataset_utils.py:44).
DE_DICT_COMBINE: Dict[str, int] = {
    "denoise_15": 0,
    "denoise_25": 0,
    "denoise_50": 0,
    "derain": 1,
    "dehaze": 2,
    "deblur": 3,
    "lowlight": 4,
}
@dataclass(frozen=True)
class ModelConfig:
    """RCOT two-pass Restormer transport map (reference: Net_Restormer.py:215-434)."""

    # Which T_net: "restormer" (flagship, Net_Restormer.py:215-434) or
    # "mprnet" (legacy paper-v1 backbone, Net.py:179-216 — the one the
    # distributed pretrained weights use). The Restormer fields below are
    # ignored for mprnet, which uses its canonical n_feat/scale dims.
    backbone: str = "restormer"
    mprnet_n_feat: int = 80
    mprnet_scale_feats: int = 48
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Tuple[int, int, int, int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Tuple[int, int, int, int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    # Round the GDFN hidden size UP to this multiple. 1 = reference sizing
    # int(dim*2.66) -> 127/255/510/1021 (parameter parity). The "turbo"
    # configs use 128 so every depthwise-conv channel count is 128-lane
    # aligned — XLA's conv "data formatting" copies around misaligned
    # channels are the largest non-compute cost in the profiled iteration
    # (BENCH.md). Non-parity: changes parameter count.
    ffn_hidden_multiple: int = 1
    bias: bool = False
    layernorm_type: str = "WithBias"  # or "BiasFree"
    # decoder=True runs the residual-conditioned second pass. (The reference
    # also gates the conditioning blocks on this flag, but its decoder=False
    # path is structurally broken — channel mismatch at up4_3 — so here the
    # conditioning blocks always run and the flag only controls pass 2.)
    decoder: bool = True
    latent_cond_scale: float = 0.8  # latent += scale * reslatent (Net_Restormer.py:401)
    # Instantiate the reference's defined-but-unused modules so total parameter
    # count pins to 46,853,150 (reference: Net_Restormer.py:232,237-241,252,
    # 263,272,287-292 — res_patch_embed, chnl_reduce*, reduce_noise_channel_*,
    # resdown3_4, resnoise_level3, resreduce_noise_level3 are never called in
    # forward). Set False to drop the ~1.9M dead parameters.
    parity_params: bool = True

    @property
    def dims(self) -> Tuple[int, int, int, int]:
        d = self.dim
        return (d, d * 2, d * 4, d * 8)


@dataclass(frozen=True)
class CriticConfig:
    """OT potential / WGAN critic (reference: Net_Restormer.py:436-522)."""

    patch_size: int = 128
    in_channels: int = 3
    # "pooled" head is resolution-agnostic (global average pool before FCs);
    # "flatten" reproduces the reference's patch-size-bound FC sizing
    # (num_fea = patch_size**2 / 2, reference: Net_Restormer.py:493-496).
    head: str = "flatten"
    # fc mid width; None = num_fea // 4 (Net_Restormer.py:494). The legacy
    # critic fixes it at 2048 (Net.py:275: fc = Linear(512*8*8, 2048)).
    fc_mid: Optional[int] = None


@dataclass(frozen=True)
class DataConfig:
    """Dataset / degradation pipeline (reference: util/dataset_utils.py:27-281)."""

    de_type: Tuple[str, ...] = ("denoise_15", "denoise_25", "denoise_50", "derain", "dehaze")
    data_file_dir: str = "data_dir/"
    denoise_dir: str = "data/Train/Denoise/"
    derain_dir: str = "data/Train/Derain/"
    dehaze_dir: str = "data/Train/Dehaze/"
    deblur_dir: str = "data/Train/Deblur/"
    lowlight_dir: str = "data/Train/Lowlight/"
    single_dir: str = "data/Train/Single/"
    patch_size: int = 128
    crop_base: int = 16  # images pre-cropped to multiples of this (dataset_utils.py:226)
    # Oversampling factors (reference: util/dataset_utils.py:89-161).
    oversample: Dict[str, int] = field(
        default_factory=lambda: {
            "denoise": 5, "derain": 360, "deblur": 5, "lowlight": 20, "single": 5,
        }
    )
    num_workers: int = 8
    prefetch: int = 2  # batches double-buffered onto device


@dataclass(frozen=True)
class TrainConfig:
    """Minimax training recipe (reference: trainer.py:22-58,119-126,228-243)."""

    batch_size: int = 3
    num_epochs: int = 51
    lr: float = 1e-4  # critic LR; transport map uses lr/2 (trainer.py:122-126)
    lr_step: int = 20  # step decay: lr * 0.1**(epoch//step) (trainer.py:228-231)
    optimizer: str = "RMSprop"  # or "Adam"
    pairnum: int = 0  # iterations < pairnum//batch_size get the paired L1 term
    Sigma: float = 1e4  # paired L1 weight (trainer.py:50)
    sigma: float = 1.0  # OT transport-cost weight (trainer.py:51)
    gp_weight: float = 10.0  # gradient-penalty weight (trainer.py:305)
    seed: int = 0
    # Loss math: "reference" reproduces the operator-precedence quirks exactly
    # (SURVEY.md §2.2 #2,#4); "clean" uses the presumably-intended math
    # (true RMS of the Fourier magnitudes).
    loss_math: str = "reference"
    dtype: str = "float32"  # activation dtype: float32 | bfloat16
    log_every: int = 10
    eval_every: int = 1  # epochs
    ckpt_every: int = 1  # epochs
    ckpt_every_steps: int = 0  # mid-epoch checkpoints for step-exact recovery (0=off)
    ckpt_dir: str = "checkpoint/"
    ckpt_keep: int = 3
    run_name: str = "Deraining"
    fail_at_step: int = -1  # fault injection for recovery tests (-1 = off)
    data_axis: str = "data"  # mesh axis name for data parallelism
    # Dump output/degraded/target/res sample grids every N epochs into
    # checksample/<run_name>/ (reference does this every 10 ITERATIONS from
    # inside the hot loop, trainer.py:355-358 — ours is off the hot path).
    sample_every: int = 0  # 0 = off
    sample_dir: str = "checksample/"


@dataclass(frozen=True)
class EvalConfig:
    """Inference / evaluation (reference: tester.py:13-31)."""

    degset: str = "./data/test/derain/Rain100L/input/"
    tarset: str = "./data/test/derain/Rain100L/target/"
    save: str = "./results/OUT/"
    savetar: str = "./results/TAR/"
    saveres: str = "./results/RES/"
    # Full-res images are padded (reflect) to multiples of 8 and cropped back
    # — fixes the reference's mod-4 crop vs mod-8 network contract mismatch
    # (SURVEY.md §2.2 #9; tester.py:77-84).
    pad_to: int = 8
    tile: int = 0  # 0 = whole-image; else overlap-tiled inference
    tile_overlap: int = 32
    batch_size: int = 1
    noise_sigma: float = 0.0  # synthetic noise on GT (tester_noise.py:93-99)


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    critic: CriticConfig = field(default_factory=CriticConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True, default=str)

    # Fields that are pure IO sinks: relocating them between runs (e.g.
    # checkpointing to a different directory after a preemption, or a
    # different sample/results path) does not change what is trained, so
    # they are excluded from the semantic hash below — otherwise every
    # relocated resume logs a false resume_config_mismatch (observed with
    # the round-3 all-in-one resume when its ckpt dir moved off wiped /tmp).
    _IO_SINK_FIELDS = (("train", "ckpt_dir"), ("train", "sample_dir"),
                       ("eval", "save"), ("eval", "savetar"),
                       ("eval", "saveres"))

    def hash(self) -> str:
        """Semantic config hash for checkpoint-resume compatibility checks —
        covers everything that affects the training computation, not where
        artifacts are written."""
        d = self.to_dict()
        for section, name in self._IO_SINK_FIELDS:
            d[section].pop(name, None)
        return hashlib.sha256(
            json.dumps(d, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]

    def hash_legacy(self) -> str:
        """The pre-round-4 hash scheme (every field, IO sinks included).
        Checkpoints written before the IO-sink exclusion store this value,
        so resume accepts it as a known alias — otherwise every old
        checkpoint logs a spurious one-time resume_config_mismatch even
        with an identical config (advisor r3)."""
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:16]

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)


def _recipe(de_type: Tuple[str, ...], run_name: str, **train_overrides) -> Config:
    train = TrainConfig(
        batch_size=3, num_epochs=51, pairnum=10_000_000, Sigma=1e4, sigma=1.0,
        run_name=run_name, **train_overrides,
    )
    return Config(
        data=DataConfig(de_type=de_type, patch_size=128),
        critic=CriticConfig(patch_size=128),
        train=train,
    )


# Named presets mirroring the four README commands (reference: README.md:99-115).
PRESETS: Dict[str, Config] = {
    "derain": _recipe(("derain",), "Deraining"),
    "dehaze": _recipe(("dehaze",), "Dehazing"),
    "denoise_50": _recipe(("denoise_50",), "Denoising"),
    "single": _recipe(("single",), "single"),
    # All-in-one multi-degradation training (reference default --de_type).
    "all_in_one": _recipe(
        ("denoise_15", "denoise_25", "denoise_50", "derain", "dehaze"), "AllInOne"
    ),
    # SRx4: 'single'-type training on bicubic-degraded HR patches
    # (BASELINE.json config #5; tools/make_sr_folder.py builds the
    # bicubic-degraded 'single' folder offline via data/sr.py sr_degrade).
    "sr_x4": _recipe(("single",), "SRx4"),
    # deblur (GoPro-style blur/sharp folders) and lowlight (LOL-style
    # low/high folders) — de_ids 5 and 6 (util/dataset_utils.py:40).
    "deblur": _recipe(("deblur",), "Deblurring"),
    "lowlight": _recipe(("lowlight",), "Lowlight"),
}

# Lane-aligned TPU "turbo" model: identical architecture, GDFN hiddens rounded
# up to 128 (127/255/510/1021 -> 128/256/512/1024) so the depthwise-conv
# channel counts (2*hidden) are 128-lane aligned. NOT parameter-parity with
# the reference (+~0.5% params/FLOPs); trains the same objective. The unused
# parity modules are dropped too — they exist only for the param-count pin.
TURBO_MODEL = ModelConfig(ffn_hidden_multiple=128, parity_params=False)
PRESETS["derain_turbo"] = dataclasses.replace(
    _recipe(("derain",), "Deraining_turbo"), model=TURBO_MODEL)
PRESETS["all_in_one_turbo"] = dataclasses.replace(
    PRESETS["all_in_one"], model=TURBO_MODEL,
    train=dataclasses.replace(PRESETS["all_in_one"].train,
                              run_name="AllInOne_turbo"))


def get_preset(name: str) -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name]
