"""Experiment configuration: dataclass tree + dotted overrides + presets.

The reference composes ~60 Hydra YAML groups (`/root/reference/config/`,
SURVEY.md §5.6). Here the same surface is a typed dataclass tree with

* dotted-path CLI overrides (`encoder.z_dim=2 rate.mode=H_hyper`) with
  literal-eval coercion — the Hydra override syntax users already know,
* named presets mirroring the reference's experiment groups
  (banana_viz_VIC, mnist_aug VIC, stl10 BINCE, CLIP lossy_Z, ...),
* a path naming scheme encoding key hyperparameters (config/main.yaml:47-49)
  so the aggregator can parse params back out of result paths.
"""

from __future__ import annotations

import ast
import copy
import dataclasses
from dataclasses import field
from pathlib import Path
from typing import Any

from ..compressors.compressor import (CompressorConfig, EncoderConfig,
                                      LossConfig, OnlineEvalConfig)
from ..compressors.distortions import DistortionConfig
from ..compressors.rates import RateConfig
from ..pipeline.predictor import PredictorConfig
from ..train.state import OptimConfig


@dataclasses.dataclass
class DataConfig:
    name: str = "banana"
    batch_size: int = 1024
    val_batch_size: int = 2048
    n_epochs: int = 10
    kwargs: dict = field(default_factory=dict)   # forwarded to the dataset


@dataclasses.dataclass
class TrainerConfig:
    seed: int = 123
    log_every: int = 100
    ckpt_every_epochs: int = 1
    monitor: str = "loss"
    monitor_mode: str = "min"
    limit_train_batches: float = 1.0   # dev-mode caps (config/mode/dev.yaml)
    limit_eval_batches: float = 1.0
    # fuse sampling+augmentation+updates into one XLA program per epoch when
    # the dataset exposes a device sampler (fast path on TPU)
    use_fused_epochs: bool = True
    # data-parallel mesh size for training/eval: 1 = single chip (trivial
    # mesh), 0 = every visible device. The multi-device story is a config
    # flag exactly like the reference's trainer.gpus (main.py:472-480);
    # batches are sharded over the mesh and XLA inserts the gradient
    # all-reduce / contrastive all-gather over ICI.
    n_devices: int = 1
    # training metrics sink: csv (default) | wandb | none
    # (reference main.py:434-459, config/logger/*.yaml)
    logger: str = "csv"
    # compute precision for encoder/decoder bodies: fp32 | bf16. bf16 runs
    # the matmuls/convs on the MXU at double rate with fp32 params + norm
    # stats — the TPU analog of the reference's trainer.precision: 16
    # (config/main.yaml). Entropy-model likelihoods and the rate affine
    # remain fp32 islands regardless (SURVEY.md §5.2).
    precision: str = "fp32"


@dataclasses.dataclass
class ExperimentConfig:
    experiment: str = "dev"
    stage: str = "featurizer"
    out_dir: str = "results"
    ckpt_dir: str = "checkpoints"
    is_only_feat: bool = False
    is_skip_comm: bool = False

    data_feat: DataConfig = field(default_factory=DataConfig)
    data_pred: DataConfig | None = None          # defaults to data_feat

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    rate: RateConfig = field(default_factory=RateConfig)
    distortion: DistortionConfig = field(default_factory=DistortionConfig)
    online: OnlineEvalConfig = field(default_factory=OnlineEvalConfig)
    loss: LossConfig = field(default_factory=LossConfig)

    # the reference's global optimizer defaults (config/main.yaml:17-22):
    # AdamW lr 1e-3 (featurizer) / 3e-4 (coder, online), weight decay 1e-5,
    # exponential lr decay by 100x over training (scheduler expdecay100);
    # presets/CLI override per recipe. total_steps=0 -> span the planned
    # training (bound at dataset-bind time, run.py).
    optimizer_feat: OptimConfig = field(
        default_factory=lambda: OptimConfig(mode="adamw", lr=1e-3,
                                            weight_decay=1e-5,
                                            scheduler="expdecay",
                                            decay_factor=100.,
                                            total_steps=0))
    optimizer_coder: OptimConfig = field(
        default_factory=lambda: OptimConfig(mode="adamw", lr=3e-4,
                                            weight_decay=1e-5,
                                            scheduler="expdecay",
                                            decay_factor=100.,
                                            total_steps=0))
    optimizer_online: OptimConfig = field(
        default_factory=lambda: OptimConfig(mode="adamw", lr=3e-4,
                                            weight_decay=1e-5,
                                            scheduler="expdecay",
                                            decay_factor=100.,
                                            total_steps=0))

    predictor: PredictorConfig = field(default_factory=PredictorConfig)

    trainer: TrainerConfig = field(default_factory=TrainerConfig)

    # parameter-subtree names receiving zero updates — the reference's
    # Freezer callback (callbacks.py:503-531) for staggered training, e.g.
    # ("p_ZlX",) freezes the encoder in a stag_step2 run
    frozen: tuple = ()

    # filled from the dataset at runtime (main.py:346-373)
    in_shape: Any = None
    target_shape: Any = None
    aux_shape: Any = None

    def compressor_config(self) -> CompressorConfig:
        return CompressorConfig(
            encoder=self.encoder, rate=self.rate, distortion=self.distortion,
            online=self.online, loss=self.loss, in_shape=self.in_shape,
            target_shape=self.target_shape, aux_shape=self.aux_shape)

    @property
    def long_name(self) -> str:
        """Path segment encoding the config (config/main.yaml:47-49 scheme)."""
        return "/".join([
            f"exp_{self.experiment}",
            f"datafeat_{self.data_feat.name}",
            f"dist_{self.distortion.mode}",
            f"enc_{self.encoder.arch}",
            f"rate_{self.rate.mode}",
            f"zdim_{self.encoder.z_dim}",
            f"beta_{self.loss.beta:.1e}",
            f"seed_{self.trainer.seed}",
        ])

    @property
    def stage_dir(self) -> Path:
        return Path(self.out_dir) / self.long_name


# architectures whose modules accept a dtype= compute-precision kwarg
_DTYPE_ARCHS = {"mlp", "cnn", "balle", "resnet", "clip", "clip_vit",
                "clip_rn50", "simclr", "swav"}


def apply_precision(cfg: ExperimentConfig) -> ExperimentConfig:
    """Resolve trainer.precision into arch dtype kwargs (idempotent).

    bf16 is injected into the encoder and distortion-decoder arch kwargs
    (probes stay fp32 — they are tiny and their CE/acc metrics are the
    product). An explicit arch_kwargs.dtype always wins.
    """
    if cfg.trainer.precision in ("fp32", "float32", "32", None):
        return cfg
    if cfg.trainer.precision not in ("bf16", "bfloat16", "16"):
        raise ValueError(
            f"trainer.precision={cfg.trainer.precision!r}: use fp32 or bf16")

    def with_dtype(kw):
        kw = dict(kw)
        kw.setdefault("dtype", "bfloat16")
        return kw

    if cfg.encoder.arch in _DTYPE_ARCHS:
        cfg.encoder = dataclasses.replace(
            cfg.encoder, arch_kwargs=with_dtype(cfg.encoder.arch_kwargs))
    # arch=None resolves to cnn/mlp decoders inside the estimator — all
    # dtype-capable for the direct mode
    if cfg.distortion.arch in _DTYPE_ARCHS or (
            cfg.distortion.arch is None and cfg.distortion.mode == "direct"):
        cfg.distortion = dataclasses.replace(
            cfg.distortion,
            arch_kwargs=with_dtype(cfg.distortion.arch_kwargs))
    return cfg


# ---------------------------------------------------------------------------
# Overrides
# ---------------------------------------------------------------------------


def _coerce(value: str):
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def apply_overrides(cfg: ExperimentConfig, overrides: list[str]) -> ExperimentConfig:
    """Apply `a.b.c=value` assignments; frozen dataclasses are rebuilt."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, value = ov.split("=", 1)
        parts = key.split(".")
        if parts[0] == "data_pred" and len(parts) > 1 and cfg.data_pred is None:
            # reference begin() (main.py:246-251): data_pred defaults to
            # data_feat and overrides are merged on top of that copy
            cfg.data_pred = copy.deepcopy(cfg.data_feat)
        _set_path(cfg, parts, _coerce(value))
    return cfg


def _set_path(obj, parts: list[str], value):
    head, rest = parts[0], parts[1:]
    if not rest:
        _set_attr(obj, head, value)
        return
    child = _get_attr(obj, head)
    if dataclasses.is_dataclass(child) and _is_frozen(child):
        # rebuild the frozen child with the nested assignment applied
        _set_attr(obj, head, _rebuild_frozen(child, rest, value))
    else:
        _set_path(child, rest, value)


def _rebuild_frozen(child, parts, value):
    kw = {f.name: getattr(child, f.name) for f in dataclasses.fields(child)}
    head, rest = parts[0], parts[1:]
    if not rest:
        if head not in kw:
            raise AttributeError(
                f"{type(child).__name__} has no field {head!r}")
        kw[head] = value
    else:
        inner = kw[head]
        if dataclasses.is_dataclass(inner) and _is_frozen(inner):
            kw[head] = _rebuild_frozen(inner, rest, value)
        elif isinstance(inner, dict):
            inner = dict(inner)
            _set_dict_path(inner, rest, value)
            kw[head] = inner
        else:
            _set_path(inner, rest, value)
    return type(child)(**kw)


def _set_dict_path(d: dict, parts, value):
    if len(parts) == 1:
        d[parts[0]] = value
    else:
        _set_dict_path(d.setdefault(parts[0], {}), parts[1:], value)


def _is_frozen(obj) -> bool:
    return getattr(type(obj), "__dataclass_params__").frozen


def _get_attr(obj, name):
    if isinstance(obj, dict):
        return obj[name]
    if not hasattr(obj, name):
        raise AttributeError(f"{type(obj).__name__} has no field {name!r}")
    return getattr(obj, name)


def _set_attr(obj, name, value):
    if isinstance(obj, dict):
        obj[name] = value
        return
    if not hasattr(obj, name):
        raise AttributeError(f"{type(obj).__name__} has no field {name!r}")
    if dataclasses.is_dataclass(obj) and _is_frozen(obj):
        raise AttributeError(
            f"cannot set {name} on frozen {type(obj).__name__} directly")
    setattr(obj, name, value)


# ---------------------------------------------------------------------------
# Presets (the reference's experiment groups, bin/*/*.sh + config groups)
# ---------------------------------------------------------------------------


def preset(name: str) -> ExperimentConfig:
    cfg = _preset_impl(name)
    # reference default is HALF-precision training (trainer.precision: 16,
    # config/main.yaml:124); only the banana scripts pin 32
    # (bin/banana/*.sh:46-47). bf16 is the TPU analog — measured 1.59x on
    # the stl10_bince train step (PERF.md "Training-step throughput").
    # CLI/test overrides run after preset() and still win.
    if not cfg.experiment.startswith("banana") and \
            cfg.trainer.precision == "fp32":
        cfg.trainer = dataclasses.replace(cfg.trainer, precision="bf16")
    return cfg


def _preset_impl(name: str) -> ExperimentConfig:
    if name in ("banana_viz_VIC", "banana_vic"):
        # bin/banana/banana_viz_VIC.sh
        return ExperimentConfig(
            experiment="banana_viz_VIC",
            # reference recipe (bin/banana/banana_viz_VIC.sh +
            # config/data/base_banana.yaml): 100 epochs x 1000 steps of
            # batch 1024 (length=1024000), lr 3e-4 with exponential decay
            # /1000 (featurizer) and /100 (coder) over training
            data_feat=DataConfig(name="banana", batch_size=1024, n_epochs=100,
                                 kwargs=dict(additional_target="representative",
                                             length=1024000)),
            optimizer_feat=OptimConfig(lr=3e-4, scheduler="expdecay",
                                       decay_factor=1000., total_steps=0),
            optimizer_coder=OptimConfig(lr=3e-4, scheduler="expdecay",
                                        decay_factor=100., total_steps=0),
            encoder=EncoderConfig(
                arch="mlp", z_dim=2, family="deterministic",
                arch_kwargs=dict(hid_dim=1024, n_hid_layers=2,
                                 norm_layer="batchnorm",
                                 activation="quickgelu")),
            rate=RateConfig(mode="H_factorized"),
            distortion=DistortionConfig(
                mode="direct", data_mode="distribution",
                is_classification=False,
                arch_kwargs=dict(hid_dim=1024, n_hid_layers=2,
                                 norm_layer="batchnorm",
                                 activation="quickgelu")),
            online=OnlineEvalConfig(is_online=True, is_classification=False,
                                    arch_kwargs=dict(hid_dim=512)),
            loss=LossConfig(beta=0.07, beta_anneal="constant"),
            predictor=PredictorConfig(is_classification=False),
        )
    if name in ("banana_viz_VAE", "banana_vae"):
        cfg = preset("banana_viz_VIC")
        cfg.experiment = "banana_viz_VAE"
        cfg.data_feat.kwargs["additional_target"] = "input"
        # VAE.yaml ships factor_beta=0.5, but the banana experiment script
        # pins distortion.factor_beta=1 over it (bin/banana/
        # banana_viz_VIC.sh:21), so the published banana VAE numbers use 1
        return cfg
    if name in ("mnist_vic", "augmnist_viz_VIC"):
        # bin/mnist/augmnist_viz_VIC.sh: resnet18 encoder, H_hyper rate,
        # z=128, beta=0.1, 100 epochs on augmented MNIST (the mnist spec's
        # default equivalence set = mnist_aug's [x/y-translation, rotation,
        # scale, shear]); featurizer=neural_rec = image reconstruction
        return ExperimentConfig(
            experiment="augmnist_viz_VIC",
            data_feat=DataConfig(name="mnist", batch_size=256, n_epochs=100,
                                 kwargs=dict(additional_target="representative")),
            encoder=EncoderConfig(arch="resnet", z_dim=128),
            rate=RateConfig(mode="H_hyper"),
            distortion=DistortionConfig(mode="direct", data_mode="image",
                                        arch_kwargs=dict(hid_dim=32)),
            online=OnlineEvalConfig(is_online=True, is_classification=True,
                                    arch_kwargs=dict(hid_dim=512)),
            loss=LossConfig(beta=0.1),
        )
    if name in ("stl10_bince",):
        return ExperimentConfig(
            experiment="stl10_bince",
            data_feat=DataConfig(name="stl10", batch_size=256, n_epochs=20,
                                 kwargs=dict(additional_target="equiv_x")),
            encoder=EncoderConfig(arch="resnet", z_dim=128),
            rate=RateConfig(mode="H_factorized"),
            distortion=DistortionConfig(mode="contrastive", project_dim=128),
            online=OnlineEvalConfig(is_online=True,
                                    arch_kwargs=dict(hid_dim=512)),
            loss=LossConfig(beta=0.01),
        )
    if name in ("clip_lossyZ", "clip_bottleneck"):
        # bottleneck_clip_lossyZ: FROZEN CLIP tower (finetune=freezer) +
        # hyperprior rate on the 512-d embeddings, lossy_Z distortion,
        # beta 5e-2 linearly annealed (config/featurizer/
        # bottleneck_clip_lossyZ.yaml; the hub's factorized variant is
        # clip_bottleneck_pretrain below)
        return ExperimentConfig(
            experiment="clip_lossyZ",
            data_feat=DataConfig(name="stl10", batch_size=128, n_epochs=10,
                                 kwargs=dict(additional_target="target")),
            encoder=EncoderConfig(arch="clip", z_dim=512),
            rate=RateConfig(mode="H_hyper", is_endToEnd=False),
            distortion=DistortionConfig(mode="lossy_Z"),
            online=OnlineEvalConfig(is_online=True,
                                    arch_kwargs=dict(hid_dim=512)),
            loss=LossConfig(beta=0.05),
            frozen=("p_ZlX",),
            # the reference recipe's optimizers: AdamW + uniform-multistep
            # /1000 decay (bottleneck_clip_lossyZ.yaml optimizer_feat/coder)
            optimizer_feat=OptimConfig(mode="adamw", lr=1e-3,
                                       weight_decay=3e-8,
                                       scheduler="unifmultistep",
                                       decay_factor=1000., total_steps=0),
            optimizer_coder=OptimConfig(mode="adamw", lr=3e-4,
                                        weight_decay=1e-6,
                                        scheduler="unifmultistep",
                                        decay_factor=1000., total_steps=0),
        )
    if name in ("banana_viz_BINCE", "banana_bince"):
        # bin/banana/banana_viz_BINCE.sh: contrastive distortion on banana
        # with a 1-d latent (encoder.z_dim=1), the contrastive defaults
        # (trainable temperature 0.01, cosine logits) and the effective-
        # batch-size reweighting DISABLED (the script pins it to null)
        cfg = preset("banana_viz_VIC")
        cfg.experiment = "banana_viz_BINCE"
        cfg.data_feat.kwargs["additional_target"] = "equiv_x"
        cfg.encoder = dataclasses.replace(cfg.encoder, z_dim=1)
        cfg.distortion = DistortionConfig(mode="contrastive", project_dim=1,
                                          effective_batch_size=None)
        # the script pins featurizer.loss.beta=0.6 (banana_viz_BINCE.sh:68)
        cfg.loss = dataclasses.replace(cfg.loss, beta=0.6)
        return cfg
    if name in ("banana_viz_VIC_trnslt",):
        # bin/banana/banana_viz_VIC_trnslt.sh: translation equivalence
        cfg = preset("banana_viz_VIC")
        cfg.experiment = "banana_viz_VIC_trnslt"
        cfg.data_feat.kwargs["equivalence"] = "y_translation"
        return cfg
    if name in ("augmnist_RD", "mnist_RD"):
        # bin/mnist/augmnist_RD.sh: the beta-sweep base config
        cfg = preset("mnist_vic")
        cfg.experiment = "augmnist_RD"
        return cfg
    if name in ("mnist_stag_step1", "augmnist_stag_step1"):
        # bin/mnist/augmnist_stag_step1.sh: train the encoder with NO
        # learned rate (rate=lossless, beta=1), export weights for step 2
        cfg = preset("mnist_vic")
        cfg.experiment = "augmnist_stag"
        cfg.is_only_feat = True
        cfg.rate = RateConfig(mode="lossless")
        cfg.loss = dataclasses.replace(cfg.loss, beta=1.0)
        return cfg
    if name in ("mnist_stag_step2", "augmnist_stag_step2"):
        # bin/mnist/augmnist_stag_step2.sh: FROZEN step-1 encoder
        # (finetune=freezer; point encoder.pretrained_path at step 1's
        # export), H_hyper rate trained on top with a detached encoder
        # (is_endToEnd=False), lossy_Z distortion, beta=1e-2, 50 epochs
        cfg = preset("mnist_vic")
        cfg.experiment = "augmnist_stag"
        cfg.frozen = ("p_ZlX",)
        cfg.rate = RateConfig(mode="H_hyper", is_endToEnd=False)
        cfg.distortion = DistortionConfig(mode="lossy_Z")
        cfg.data_feat = dataclasses.replace(cfg.data_feat, n_epochs=50)
        cfg.loss = dataclasses.replace(cfg.loss, beta=1e-2)
        return cfg
    if name in ("stl10_balle",):
        # bin/stl10/STL10_balle.sh: Balle-style conv autoencoder + spatial
        # hyperprior (the classic image-compression config). z_dim=8192
        # (the reference's encoder.z_dim=8192): STL10 96px resizes to 128px,
        # 4 stride-2 convs -> 8x8 positions x 128 channels.
        return ExperimentConfig(
            experiment="stl10_balle",
            # featurizer trains on the 100k unlabeled images (reference
            # data@data_feat=stl10_unlabeled), the probe on labeled STL10
            data_feat=DataConfig(name="stl10_unlabeled", batch_size=64,
                                 n_epochs=100,
                                 kwargs=dict(additional_target="input")),
            data_pred=DataConfig(name="stl10", batch_size=64),
            encoder=EncoderConfig(arch="balle", z_dim=8192,
                                  arch_kwargs=dict(hid_dim=64)),
            rate=RateConfig(mode="H_spatial", n_channels=128),
            distortion=DistortionConfig(mode="direct", data_mode="image",
                                        arch="balle",
                                        arch_kwargs=dict(hid_dim=64)),
            # the script disables the online probe (STL10_balle.sh:51 sets
            # evaluation.featurizer.is_online=false) — it would be fully
            # masked on the unlabeled featurizer split anyway
            online=OnlineEvalConfig(is_online=False),
            # the script sweeps featurizer.loss.beta over 1e-8..1e-3
            # (STL10_balle.sh:57); the largest published point is the base
            loss=LossConfig(beta=1e-3),
        )
    if name in ("stl10_rate_variation",):
        # bin/stl10/STL10_rate_variation.sh: VIC/VAE on unlabeled STL10,
        # sweep rate.mode over {H_factorized, H_hyper, MI_unitgaussian}
        # (+ beta/beta_anneal) on the CLI
        cfg = preset("stl10_understand_VIC")
        cfg.experiment = "stl10_rate_variation"
        cfg.rate = RateConfig(mode="H_factorized")
        return cfg
    if name in ("stl10_dist_variation",):
        # bin/stl10/STL10_dist_variation_{featpred,recpred}.sh: resnet18 +
        # H_hyper on unlabeled STL10, sweep distortion over VIC/VAE/BINCE
        # (+ z_dim/beta/factor_beta) on the CLI
        cfg = preset("stl10_understand_VIC")
        cfg.experiment = "stl10_dist_variation"
        return cfg
    if name in ("clip_bottleneck_pretrain",):
        # bin/clip/clip_bottleneck_pretrain.sh: pretrain the CLIP
        # bottleneck on COCO — featurizer=bottleneck_clip_lossyZ (frozen
        # tower, lossy_Z, H_hyper rate, beta 5e-2, featurizer only)
        return ExperimentConfig(
            experiment="clip_bottleneck_pretrain",
            is_only_feat=True,
            data_feat=DataConfig(name="coco_clip", batch_size=128,
                                 n_epochs=30, kwargs=dict()),
            encoder=EncoderConfig(arch="clip", z_dim=512),
            rate=RateConfig(mode="H_hyper", is_endToEnd=False),
            distortion=DistortionConfig(mode="lossy_Z"),
            online=OnlineEvalConfig(is_online=False),
            loss=LossConfig(beta=0.05),
            frozen=("p_ZlX",),
            optimizer_feat=OptimConfig(mode="adamw", lr=1e-3,
                                       weight_decay=3e-8,
                                       scheduler="unifmultistep",
                                       decay_factor=1000., total_steps=0),
            optimizer_coder=OptimConfig(mode="adamw", lr=3e-4,
                                        weight_decay=1e-6,
                                        scheduler="unifmultistep",
                                        decay_factor=1000., total_steps=0),
        )
    if name in ("clip_hub",):
        # bin/clip/clip_hub.sh: train the three hub betas on COCO with
        # featurizer=bottleneck_clip_lossyZ_factorized — same recipe but
        # the FACTORIZED rate, whose EB state dict becomes the published
        # hub/beta*/factorized_rate.pt (sweep loss.beta over
        # {1e-2, 5e-2, 1e-1} on the CLI; export via hub.save_hub)
        cfg = preset("clip_bottleneck_pretrain")
        cfg.experiment = "clip_hub"
        cfg.rate = RateConfig(mode="H_factorized", eb_filters=(3, 3, 3, 3),
                              is_endToEnd=False)
        return cfg
    if name in ("ssl_bottleneck_pretrain",):
        # bin/ssl/bottleneck_pretrain.sh: same bottleneck on SSL ResNet-50
        # towers; switch tower via encoder.arch={clip_rn50,simclr,swav}
        cfg = preset("clip_bottleneck_pretrain")
        cfg.experiment = "ssl_bottleneck_pretrain"
        # CLIP RN50's AttentionPool2d emits 1024-d embeddings (the reference
        # asserts out_dim==1024 for clip_rn50, architectures.py:339-340);
        # simclr/swav towers pool to 2048 — override z_dim with the arch.
        # The rn50 recipes keep the hyperprior rate (bottleneck_rn50*_lossyZ
        # use rate=H_hyper; only the hub export is factorized)
        cfg.encoder = EncoderConfig(arch="clip_rn50", z_dim=1024)
        cfg.rate = RateConfig(mode="H_hyper", is_endToEnd=False)
        cfg.loss = dataclasses.replace(cfg.loss, beta=1e-3)
        return cfg
    if name in ("galaxy_regression", "galaxy_neurips"):
        # bin/galaxy/GalaxyZoo_neurips_final.sh: VAE reconstruction
        # featurizer — balle encoder + SPATIAL hyperprior (the script's
        # final kwargs: architecture@encoder=balle, rate=H_spatial,
        # distortion=VAE, encoder.z_dim swept {65536..8192}, beta hyperopt
        # over 1e-12..1e-4, 100 epochs) — with the 37-probability kaggle
        # regression in the predictor stage. 128px galaxy crops -> 8x8
        # positions x 128 channels at the smallest published z_dim.
        return ExperimentConfig(
            experiment="galaxy_regression",
            data_feat=DataConfig(name="galaxy_zoo", batch_size=128,
                                 n_epochs=100,
                                 kwargs=dict(additional_target="input")),
            data_pred=DataConfig(name="galaxy_zoo", batch_size=128,
                                 kwargs=dict()),
            encoder=EncoderConfig(arch="balle", z_dim=8192,
                                  arch_kwargs=dict(hid_dim=64)),
            rate=RateConfig(mode="H_spatial", n_channels=128),
            distortion=DistortionConfig(mode="direct", data_mode="image",
                                        arch="balle",
                                        arch_kwargs=dict(hid_dim=64)),
            online=OnlineEvalConfig(is_online=True, is_classification=False,
                                    arch_kwargs=dict(hid_dim=512)),
            loss=LossConfig(beta=1e-6),
            predictor=PredictorConfig(is_classification=False),
        )
    if name in ("clip_bottleneck_linear_eval",):
        # bin/clip/clip_bottleneck_linear_eval.sh: linear probe on the
        # frozen compressed features of a downstream dataset (set
        # data_pred.name=<dataset> on the CLI to pick the probe dataset)
        cfg = preset("clip_lossyZ")
        cfg.experiment = "clip_bottleneck_linear_eval"
        cfg.predictor = PredictorConfig(arch="linear", arch_kwargs={},
                                        n_epochs=20)
        return cfg
    if name in ("clip_bottleneck_mlp_eval",):
        cfg = preset("clip_bottleneck_linear_eval")
        cfg.experiment = "clip_bottleneck_mlp_eval"
        cfg.predictor = PredictorConfig()  # the default 2048-wide MLP probe
        return cfg
    if name in ("banana_RD",):
        # bin/banana/banana_RD.sh: the beta-sweep base over the rotated
        # banana (sweep loss.beta on the CLI / via pipeline.hypopt)
        cfg = preset("banana_viz_VIC")
        cfg.experiment = "banana_RD"
        return cfg
    if name in ("clip_raw_linear_eval",):
        # bin/clip/clip_raw_linear_eval.sh: RAW frozen CLIP features — no
        # entropy bottleneck (lossless rate), featurizer kept at init
        # (featurizer.is_use_init=True -> n_epochs=0), LinearSVC probe
        cfg = preset("clip_bottleneck_linear_eval")
        cfg.experiment = "clip_raw_linear_eval"
        cfg.rate = RateConfig(mode="lossless")
        cfg.data_feat = dataclasses.replace(cfg.data_feat, n_epochs=0)
        return cfg
    if name in ("clip_raw_mlp_eval",):
        # bin/clip/clip_raw_mlp_eval.sh
        cfg = preset("clip_raw_linear_eval")
        cfg.experiment = "clip_raw_mlp_eval"
        cfg.predictor = PredictorConfig()
        return cfg
    if name in ("augmnist_aug", "augmnist_aug_warm"):
        # bin/mnist/augmnist_aug{,_warm}.sh: augmentation-impact study —
        # resnet encoder, H_hyper rate, probe trained on augmented MNIST.
        # The _warm variant's only delta in the reference script is
        # rate.kwargs.warmup_k_epoch=5: the rate loss runs on a detached
        # encoder for the first 5 epochs (matched exactly here; the
        # pipeline converts epochs -> steps at dataset-bind time)
        cfg = preset("mnist_vic")
        cfg.experiment = name
        cfg.encoder = EncoderConfig(arch="resnet", z_dim=128)
        cfg.data_feat = dataclasses.replace(cfg.data_feat, n_epochs=100)
        cfg.data_pred = DataConfig(name="mnist", batch_size=256,
                                   kwargs=dict(additional_target="representative"))
        cfg.loss = dataclasses.replace(cfg.loss, beta_anneal="constant")
        if name.endswith("_warm"):
            cfg.rate = dataclasses.replace(cfg.rate, warmup_k_epochs=5)
        return cfg
    if name in ("stl10_action_dist_shift", "stl10_understand_VIC"):
        # bin/stl10/STL10_action_dist_shift.sh / STL10_understand_VIC.sh:
        # featurizer on (unlabeled) STL10, predictor under augmentation
        # distribution shift; VIC distortion, H_hyper rate, MLP probe
        return ExperimentConfig(
            experiment=name,
            data_feat=DataConfig(name="stl10_unlabeled", batch_size=256,
                                 n_epochs=100,
                                 kwargs=dict(additional_target="representative")),
            data_pred=DataConfig(name="stl10", batch_size=256),
            encoder=EncoderConfig(arch="resnet", z_dim=128),
            rate=RateConfig(mode="H_hyper"),
            distortion=DistortionConfig(mode="direct", data_mode="image",
                                        arch_kwargs=dict(hid_dim=64)),
            online=OnlineEvalConfig(is_online=True,
                                    arch_kwargs=dict(hid_dim=512)),
            loss=LossConfig(beta=0.1),
        )
    if name in ("ssl_bottleneck_linear_eval",):
        # bin/ssl/bottleneck_linear_eval.sh: probe the compressed SSL
        # (ResNet-50) features with a linear head
        cfg = preset("ssl_bottleneck_pretrain")
        cfg.experiment = "ssl_bottleneck_linear_eval"
        cfg.is_only_feat = False
        cfg.predictor = PredictorConfig(arch="linear", arch_kwargs={},
                                        n_epochs=20)
        return cfg
    if name in ("ssl_bottleneck_mlp_eval",):
        # bin/ssl/bottleneck_mlp_eval.sh
        cfg = preset("ssl_bottleneck_linear_eval")
        cfg.experiment = "ssl_bottleneck_mlp_eval"
        cfg.predictor = PredictorConfig()
        return cfg
    raise ValueError(f"unknown preset {name!r}")


def available_presets() -> list[str]:
    """Canonical preset names (one per reference experiment group)."""
    return ["banana_viz_VIC", "banana_viz_VAE", "banana_viz_BINCE",
            "banana_viz_VIC_trnslt", "banana_RD", "mnist_vic", "augmnist_RD",
            "augmnist_aug", "augmnist_aug_warm",
            "mnist_stag_step1", "mnist_stag_step2", "stl10_bince",
            "stl10_balle", "stl10_rate_variation", "stl10_dist_variation",
            "stl10_action_dist_shift", "stl10_understand_VIC",
            "clip_lossyZ", "clip_bottleneck_pretrain", "clip_hub",
            "ssl_bottleneck_pretrain", "ssl_bottleneck_linear_eval",
            "ssl_bottleneck_mlp_eval", "clip_bottleneck_linear_eval",
            "clip_bottleneck_mlp_eval", "clip_raw_linear_eval",
            "clip_raw_mlp_eval", "galaxy_regression"]
