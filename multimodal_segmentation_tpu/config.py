"""Typed experiment configuration with the reference's three presets.

Mirrors configuration/mmsdnet_config_chaos.py, dafnet_config_chaos.py and
dafnet_spade_config_chaos.py (params dicts + get()), as dataclasses. The
same CLI surface (--config --split --l_mix --test --automatedpairing
--randomise --test_dataset) is provided by experiment.py.
"""

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class AnatomyEncoderConfig:
    """configuration/*_config_chaos.py anatomy_encoder_params."""

    normalise: str = "batch"   # 'batch' | 'instance' | 'none'
    downsample: int = 4
    filters: int = 64
    out_channels: int = 8
    rounding: bool = True


@dataclasses.dataclass
class DiscriminatorConfig:
    """configuration/*_config_chaos.py d_mask_params / d_image_params."""

    filters: int = 64
    lr: float = 1e-4
    downsample_blocks: int = 3
    spectral_alpha: float = 10.0


@dataclasses.dataclass
class ExperimentConfig:
    """Top-level config (configuration/dafnet_config_chaos.py:3-28)."""

    seed: int = 10
    folder: str = "dafnet_chaos"
    epochs: int = 500
    batch_size: int = 6
    split: int = 0
    dataset_name: str = "chaos"
    test_dataset: str = "chaos"
    input_shape: Tuple[int, int, int] = (192, 192, 1)
    image_downsample: int = 1
    modality: Tuple[str, str] = ("t1", "t2")
    model: str = "dafnet"            # 'mmsdnet' | 'dafnet'
    executor: str = "dafnet"
    l_mix: float = 1.0
    decoder_type: str = "film"       # 'film' | 'spade'
    num_z: int = 8
    num_masks: int = 4
    n_pairs: int = 3
    w_sup_M: float = 10.0
    w_adv_M: float = 1.0
    w_rec_X: float = 1.0
    w_adv_X: float = 1.0
    w_rec_Z: float = 1.0
    w_kl: float = 0.1
    lr: float = 1e-4
    randomise: bool = False
    automatedpairing: bool = False
    # SWA starts averaging at this epoch (model_executors/dafnet_executor.py:45)
    swa_start_epoch: int = 40
    # Early stopping (dafnet_executor.py:222): monitor val_loss_mod2_fused
    es_patience: int = 60
    es_min_delta: float = 0.01
    # Augmentation (base_executor.py:103-110)
    rotation_range: float = 20.0
    # Mixed precision for the compute path (TPU bf16); params stay f32.
    compute_dtype: str = "float32"
    # TPS warp implementation: 'auto' (fused Pallas kernel on single-chip
    # TPU, XLA-gather jnp path elsewhere) | 'pallas' | 'jnp'.
    tps_impl: str = "auto"
    # Inference ('def'/'max' fusion) warp precision: 'bf16' routes the
    # eval-time TPS warp through the Pallas kernel with single-pass bf16
    # blend matmuls (~1e-3 abs on the warped anatomy, binarised test Dice
    # unchanged to 3 decimals — tools/eval_warp_parity.py); 'f32' keeps the
    # exact f32 path. bf16 is the production default: it removes the
    # dominant cost of the fusion inference paths (BENCH_latency.json).
    eval_warp: str = "bf16"
    # Inference activation dtype for the ModelTester / latency path. Empty
    # = same as compute_dtype. 'bfloat16' rebuilds the predict model with
    # bf16 activations (params stay f32) — binarised test Dice parity
    # measured in tools/eval_warp_parity.py, latency in BENCH_latency.json.
    eval_dtype: str = ""
    # Run each Adam update over a single flattened moment vector (one big
    # fused elementwise pass) instead of per-parameter-leaf chains. Same
    # math (train/state.py::flat_adam, exactness locked in
    # tests/test_train_state.py). Keep False under tensor parallelism so
    # the per-leaf moments can mirror parameter shardings.
    fused_adam: bool = False
    # Rematerialise UNet/segmentor conv blocks in the backward (save only
    # block inputs, recompute norm/relu intermediates). The step is
    # HBM-bound with the MXU nearly idle, so re-FLOPs are ~free.
    remat_convs: bool = False
    # Optional cap on batches per epoch (None = full epoch like the
    # reference); used by smoke runs and tests.
    steps_per_epoch: int = 0
    # Observability / debugging (SURVEY.md §5.1-5.2): write a
    # jax.profiler trace for the given epoch range, and optionally enable
    # jax_debug_nans in a debug run.
    profile_epochs: Tuple[int, int] = (0, 0)   # (start, end), end=0 disables
    debug_nans: bool = False
    # Heavy-artifact cadence (epochs). 1 = every epoch, reference parity
    # (dafnet_executor.py:253-261). Long runs on a remote-relay backend
    # raise these: per-epoch image grids and the per-component npz export
    # each download megabytes through the host link. The Orbax checkpoint
    # (resume safety) still saves every epoch regardless, and the npz
    # export always also runs at the final epoch / early stop.
    image_callback_interval: int = 1
    component_save_interval: int = 1
    # Full-train-state Orbax checkpoint cadence (epochs). 1 = every epoch
    # (reference parity, dafnet_executor.py:261). On a remote-relay
    # backend each save device_gets the full state through the host link
    # (~minutes); long runs raise this. Early stop / final epoch always
    # checkpoint regardless.
    checkpoint_interval: int = 1
    # Volumetric stretch path (BASELINE.json configs[4]; models/volumetric.py):
    # (D, H, W, sequences) per study and the 3-D UNet width/depth. Unused by
    # the 2-D CHAOS presets.
    volume_shape: Tuple[int, int, int, int] = (16, 128, 128, 3)
    filters3d: int = 16
    downsample3d: int = 3

    anatomy_encoder: AnatomyEncoderConfig = dataclasses.field(
        default_factory=AnatomyEncoderConfig
    )
    d_mask_params: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )
    d_image_params: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )

    @property
    def input_hw(self):
        h, w, _ = self.input_shape
        r = self.image_downsample
        return (int(h / r), int(w / r))

    def to_json(self):
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


def mmsdnet_chaos() -> ExperimentConfig:
    """configuration/mmsdnet_config_chaos.py (w_rec_X=10, D_Mask filters=4)."""
    return ExperimentConfig(
        folder="mmsdnet_chaos",
        model="mmsdnet",
        executor="mmsdnet",
        w_rec_X=10.0,
        d_mask_params=DiscriminatorConfig(filters=4),
    )


def dafnet_chaos() -> ExperimentConfig:
    """configuration/dafnet_config_chaos.py."""
    return ExperimentConfig(folder="dafnet_chaos", model="dafnet", executor="dafnet")


def dafnet_spade_chaos() -> ExperimentConfig:
    """configuration/dafnet_spade_config_chaos.py (SPADE decoder)."""
    return ExperimentConfig(
        folder="dafnet_spade_chaos",
        model="dafnet",
        executor="dafnet",
        decoder_type="spade",
    )


def cardiac_3d() -> ExperimentConfig:
    """Multi-sequence cardiac 3-D stretch (BASELINE.json configs[4]).

    No reference counterpart; trains models/volumetric.py's 3-D UNet on
    (16, 128, 128, 3) LGE+bSSFP+T2 volumes with the slice axis shardable
    over the 'space' mesh axis.
    """
    return ExperimentConfig(
        folder="cardiac_3d",
        model="cardiac3d",
        executor="cardiac3d",
        dataset_name="cardiac",
        test_dataset="cardiac",
        modality=("lge", "bssfp", "t2"),
        batch_size=2,
        epochs=100,
        num_masks=3,
        input_shape=(128, 128, 3),
        volume_shape=(16, 128, 128, 3),
        filters3d=16,
        downsample3d=3,
        rotation_range=15.0,  # in-plane, per-study (ops/augment.py)
    )


PRESETS = {
    "mmsdnet_config_chaos": mmsdnet_chaos,
    "dafnet_config_chaos": dafnet_chaos,
    "dafnet_spade_config_chaos": dafnet_spade_chaos,
    "cardiac_3d_config": cardiac_3d,
    # short aliases
    "mmsdnet_chaos": mmsdnet_chaos,
    "dafnet_chaos": dafnet_chaos,
    "dafnet_spade_chaos": dafnet_spade_chaos,
    "cardiac_3d": cardiac_3d,
}


def get_config(name: str) -> ExperimentConfig:
    if name not in PRESETS:
        raise ValueError(
            "Unknown config '%s'; available: %s" % (name, sorted(PRESETS))
        )
    return PRESETS[name]()


def tiny_test_config(model: str = "dafnet", decoder_type: str = "film") -> ExperimentConfig:
    """A miniature config for fast unit tests (32x32 inputs, thin nets)."""
    cfg = ExperimentConfig(
        folder="tiny",
        model=model,
        executor=model,
        input_shape=(32, 32, 1),
        batch_size=2,
        decoder_type=decoder_type,
        anatomy_encoder=AnatomyEncoderConfig(downsample=2, filters=4),
        d_mask_params=DiscriminatorConfig(filters=4, downsample_blocks=2),
        d_image_params=DiscriminatorConfig(filters=4, downsample_blocks=2),
    )
    return cfg
