"""Typed experiment configuration and the model-name micro-DSL.

The reference drives every experiment from a single JSON file with three
blocks — ``model`` / ``train`` / ``dataset`` — and dispatches base model and
strategy wrappers purely by substrings of ``model.name``
(reference: run.py:37-65, README.md:60-159). We keep that schema verbatim for
run-for-run comparability, but parse it into validated dataclasses with
explicit defaults instead of raw dict indexing.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

DEEP_CTR_BASES = ("mlp", "wdl", "nfm", "autoint", "ccpm", "pnn", "deepfm")
MTL_BASES = ("shared_bottom", "mmoe", "ple")
ALL_BASES = ("star",) + DEEP_CTR_BASES + MTL_BASES


@dataclass(frozen=True)
class NameSpec:
    """Parsed form of the model-name micro-DSL.

    ``basemodel[_extension]*`` where extensions are matched by substring
    (reference: run.py:37-65; README.md:62-94). Examples::

        mlp                      -> base=mlp, strategy=joint
        mlp_separate             -> base=mlp, strategy=separate
        mlp_meta_mamdr_finetune  -> base=mlp, strategy=mamdr, finetune=True
        star_meta_domain_negotiation -> base=star, strategy=domain_negotiation
        mlp_meta_batch           -> base=mlp, strategy=maml, batch_update=True
    """

    raw: str
    base: str                 # one of ALL_BASES
    base_family: str          # "deepctr" | "mtl" | "star"
    strategy: str             # joint|separate|maml|reptile|mldg|domain_negotiation|mamdr
    uncertainty_weight: bool
    pcgrad: bool
    finetune: bool            # post-hoc per-domain finetune stage
    batch_update: bool        # defer outer update to end of epoch ("batch")


def parse_model_name(name: str) -> NameSpec:
    """Substring dispatch mirroring reference run.py:37-65."""
    base = None
    # 'star' wins first in the reference dispatch chain (run.py:40).
    if "star" in name:
        base, family = "star", "star"
    else:
        for cand in DEEP_CTR_BASES:
            if cand in name:
                base, family = cand, "deepctr"
                break
        else:
            for cand in MTL_BASES:
                if cand in name:
                    base, family = cand, "mtl"
                    break
            else:
                raise ValueError(f"model name {name!r}: no known base model substring")

    if "separate" in name:
        strategy = "separate"
    elif "meta" in name:
        # reference: run.py:50-61 — order matters (mamdr before reptile etc.)
        if "domain_negotiation" in name:
            strategy = "domain_negotiation"
        elif "mamdr" in name:
            strategy = "mamdr"
        elif "reptile" in name:
            strategy = "reptile"
        elif "mldg" in name:
            strategy = "mldg"
        else:
            strategy = "maml"
    else:
        strategy = "joint"

    return NameSpec(
        raw=name,
        base=base,
        base_family=family,
        strategy=strategy,
        uncertainty_weight="uncertainty_weight" in name,
        pcgrad="pcgrad" in name,
        finetune="finetune" in name,
        batch_update="batch" in name,
    )


@dataclass
class ModelConfig:
    """``model`` block (README.md:100-117)."""

    name: str = "mlp"
    norm: str = "none"            # star only: pn | bn | none
    dense: str = "dense"          # star only: dense | star
    auxiliary_net: bool = False   # star only
    user_dim: int = 128
    item_dim: int = 128
    domain_dim: int = 128
    auxiliary_dim: int = 128
    hidden_dim: List[int] = field(default_factory=lambda: [256, 128, 64])
    dropout: float = 0.0
    # Mixed-precision tower compute ("float32" | "bfloat16"): params stay
    # float32 (bit-compatible checkpoints); dense-tower matmuls run in the
    # requested dtype with f32 accumulation. float32 default = reference
    # numerics. Wired through the deepctr zoo (DNN + logit head); STAR/MTL
    # accept the knob but currently compute f32.
    compute_dtype: str = "float32"
    # MTL extras (config/Taobao-10/{mmoe,ple}.json)
    tower_hidden_dim: List[int] = field(default_factory=lambda: [64])
    num_experts: int = 4
    gate_dnn_hidden_units: List[int] = field(default_factory=list)
    specific_expert_num: int = 1
    shared_expert_num: int = 1
    num_levels: int = 2
    # AutoInt
    att_head_num: int = 4
    att_layer_num: int = 3
    # CCPM
    conv_kernel_width: List[int] = field(default_factory=lambda: [6, 5])
    conv_filters: List[int] = field(default_factory=lambda: [4, 4])
    # PNN
    use_inner: bool = True
    use_outter: bool = False

    @property
    def spec(self) -> NameSpec:
        return parse_model_name(self.name)


@dataclass
class TrainConfig:
    """``train`` block (README.md:118-146)."""

    load_pretrain_emb: bool = False
    emb_trainable: bool = True
    epoch: int = 99999
    learning_rate: float = 1e-3
    meta_learning_rate: float = 1e-3
    domain_meta_learning_rate: float = 0.1
    merged_method: str = "plus"          # plus | times
    sample_num: int = 5
    add_query_domain: bool = True
    finetune_every_epoch: bool = False
    shuffle_sequence: bool = True
    meta_sequence: Union[str, List[int]] = "random"
    target_domain: int = -1
    domain_regulation_step: int = 0
    meta_train_step: int = 0
    meta_finetune_step: int = 0
    meta_split: str = "train-train"      # train-train | meta-train/val | meta-train/val-no-exclusive
    meta_split_ratio: float = 0.8
    average_meta_grad: str = "none"      # none | mean | moving_mean | drop
    meta_parms: List[str] = field(default_factory=lambda: ["all"])
    result_save_path: str = "result"
    checkpoint_path: str = "checkpoint"
    loss: str = "binary_crossentropy"
    optimizer: str = "adam"
    patience: int = 3
    val_every_step: int = 1
    histogram_freq: int = 0
    shuffle_buff_size: int = 10000
    # Finetune-stage knobs. The reference hardcodes SGD lr=0.001 for the
    # per-domain finetune stage (base_model.py:69, specific_base_model.py:120);
    # we expose it but default to reference-compatible values.
    finetune_optimizer: str = "sgd"
    finetune_learning_rate: float = 1e-3
    # New (no reference equivalent): reset inner Adam slots when strategy
    # loads new weights. Reference keeps slots across SetVarOp loads
    # (maml.py:181-187) so default False.
    reset_optimizer_on_load: bool = False
    # PCGrad: the reference deviates from the published PCGrad — it projects
    # on dot>0 and normalises by ||g|| not ||g||^2 (pcgrad.py:152-160).
    # "reference" reproduces that; "paper" uses the published rule.
    pcgrad_mode: str = "reference"
    # MAMDR initial per-domain specific weights: "random" = fresh initializer
    # draws (reference mamdr.py:30-33 init_layer — with plus-merge these are
    # random offsets, not zeros); "zeros" = zero deltas (paper intent).
    specific_init: str = "random"
    # Early stop min-delta for Keras-callback paths (base_model.py:79-82).
    min_delta: float = 1e-4
    # Restart-safe training (no reference equivalent — SURVEY §5.3 gap):
    # resume_every > 0 writes an atomic full-state snapshot (params,
    # optimizer slots, RNGs, early-stop counters, strategy state) every
    # N epochs; resume=True continues from it.
    resume: bool = False
    resume_every: int = 0
    # Observability (no reference equivalent beyond stdout/TensorBoard):
    # metrics_jsonl=True writes checkpoint_dir/metrics.jsonl events;
    # profile_dir != "" wraps each epoch in a jax.profiler trace.
    metrics_jsonl: bool = True
    profile_dir: str = ""
    # TensorBoard scalar/histogram export (reference: Keras TensorBoard
    # callback at log_dir=dirname(checkpoint_path), maml.py:42-45).
    # tensorboard=True writes per-epoch val/test scalars; histogram_freq>0
    # (the Keras knob above) additionally writes weight histograms every N
    # val epochs and implies tensorboard. metrics.jsonl from past runs can
    # be exported after the fact: python -m mamdr_tpu.utils.tb_export.
    tensorboard: bool = False
    # With histogram_freq>0, also write GRADIENT histograms (of the loss on
    # a sample batch) — the reference's Keras callback passes
    # write_grads=True (maml.py:42-45), so this defaults on.
    write_grads: bool = True
    # Tables with at least this many rows use the row-sharded shard_map
    # lookup when the Trainer is given a mesh; smaller tables replicate.
    sharded_lookup_min_rows: int = 16384
    # Per-domain finetune/separate checkpoint artifacts: the reference's
    # ModelCheckpoint writes domain_{idx}.h5 with each domain's best weights
    # during separate_train_val_test (base_model.py:77-90). True writes the
    # equivalent domain_{idx}.npz into the run's checkpoint dir.
    domain_checkpoints: bool = True
    # Flat-vector Adam (one fused update kernel instead of one per leaf;
    # bit-exact to optax.adam, ~11% faster fused epochs on v5e — see
    # train/flat_optimizer.py).
    flat_optimizer: bool = True
    # Expert parallelism: shard MMoE/PLE expert banks' expert axis over the
    # mesh's table (model) axis at init; XLA SPMD inserts the psum at the
    # gate-mixing contraction (parallel/trainer_sharding.py, tests/
    # test_expert_parallel.py). Default off: reference-scale expert banks are
    # ~5.6MB total — thousands of times below the threshold where sharding an
    # expert beats replicating it (docs/SCALING.md) — but the capability is
    # there for production expert counts.
    shard_experts: bool = False
    # MAMDR DR phase as vmapped query-domain lanes (fused.make_fused_dr_parallel):
    # "auto" = on when eligible (meta mask covers every trainable leaf, no
    # batch statistics, lane HBM fits — row-sharded tables compose, frozen
    # via closure constants and trainable via lane-stacked P(data, table)
    # leaves); "off" forces the
    # sequential dr_phase; "on" skips the HBM heuristic and RAISES if the
    # config is structurally ineligible. The per-query DR work is independent
    # once DN fixes the shared weights; the reference chains Adam slots
    # through query domains only because it reuses one live model
    # (mamdr.py:72-105). Parallel lanes start from the DR-entry slots with
    # per-lane dropout streams — bit-identical under SGD/no-dropout,
    # learning-equivalent under Adam+dropout (RESULTS.md).
    dr_parallel: str = "auto"
    # With dr_lane_chunk=C > 0 the parallel-DR lanes run as a scan over
    # ⌈n_domain/C⌉ groups of C vmapped lanes (still one dispatch) — bounds
    # concurrent lane HBM/graph size to C lanes, bitwise-equal to the
    # unchunked dispatch (tests/test_fused_loop_equivalence.py). The control
    # for large trainable-table domain counts (Amazon-13 shapes crashed the
    # TPU worker at 13 unchunked lanes).
    dr_lane_chunk: int = 0
    # Vmapped separate/finetune lanes (fused.make_fused_separate). False
    # forces the sequential per-domain loop — the reference-shaped fallback,
    # used to isolate a TPU-runtime incident where a vmapped finetune lane's
    # trainable item table was corrupted at Amazon_6 shapes (CPU clean; see
    # CLAUDE.md). Default True: the fused path is equivalence-tested and is
    # the production path for frozen-table (Taobao) configs.
    separate_fused: bool = True


@dataclass
class DatasetConfig:
    """``dataset`` block (README.md:147-158)."""

    name: str = "Amazon"                 # Amazon | Taobao | synthetic
    dataset_path: str = "dataset/Amazon"
    domain_split_path: str = "split_by_category"
    batch_size: int = 1024
    shuffle_buffer_size: int = 10000
    num_parallel_reads: int = 8
    seed: int = 123
    # Disable per-epoch train reshuffling (reference utils/dataset.py:78,
    # used to keep meta-train/val splits stable across epochs).
    fixed_train: bool = False
    # synthetic-only knobs (used by tests/bench)
    n_domain: int = 3
    n_uid: int = 100
    n_pid: int = 100
    n_per_domain: int = 2048


def _from_dict(cls, d: Dict[str, Any]):
    known = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in d.items() if k in known}
    return cls(**kwargs)


@dataclass
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ExperimentConfig":
        return cls(
            model=_from_dict(ModelConfig, d.get("model", {})),
            train=_from_dict(TrainConfig, d.get("train", {})),
            dataset=_from_dict(DatasetConfig, d.get("dataset", {})),
        )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @property
    def spec(self) -> NameSpec:
        return self.model.spec


def load_config(path: str) -> ExperimentConfig:
    with open(path, "r") as f:
        return ExperimentConfig.from_dict(json.load(f))
