"""Configuration and flag surface.

Mirrors the reference's argparse flag system (`dgcnn/flags.py`,
`DGCNN_FLAGS` [M per SURVEY.md §2 #2]) with `train`/`inference`
subcommands and the same flag vocabulary (SURVEY.md §5 Config row):
MODEL_NAME, NUM_CLASS, KVALUE, NUM_EDGE_CONV, ITERATION, REPORT_STEP,
CHECKPOINT_STEP, MINIBATCH_SIZE, NUM_POINT, SEED, LEARNING_RATE, IO_TYPE,
INPUT_FILE, OUTPUT_FILE, DATA_KEY/LABEL_KEY/WEIGHT_KEY, SHUFFLE,
MODEL_PATH, WEIGHT_PREFIX, LOG_DIR, DEBUG.

TPU-native additions: NUM_DEVICES (data-parallel shard count over the ICI
mesh — replaces the reference's GPUS list), USE_PALLAS (fused kNN kernel),
PRECISION, BUCKETS (padded/bucketed variable-length batching), PROFILE_DIR.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Optional

from dgcnn_tpu.models.dgcnn import ModelSpec


@dataclasses.dataclass
class Config:
    # command
    command: str = "train"
    # model
    model_name: str = "dgcnn"
    num_class: int = 2
    kvalue: int = 20
    num_edge_conv: int = 6
    edge_filters: Optional[tuple] = None  # default: (64,) * num_edge_conv
    head_feat_dim: int = 1024
    head_mlp: tuple = (512, 256)
    global_pool: bool = True
    dropout: float = 0.0
    bn_momentum: float = 0.9
    bn_sync: bool = True  # cross-replica BN stats (False = reference towers)
    # training
    iteration: int = 10000
    report_step: int = 100
    checkpoint_step: int = 500
    minibatch_size: int = 4
    num_point: int = 0  # 0 → derive from data / buckets
    seed: int = 123
    learning_rate: float = 1e-3
    optimizer: str = "adam"  # adam | adamw | sgd | momentum
    lr_schedule: str = "constant"  # constant | cosine | step
    lr_decay_steps: int = 0  # cosine horizon / step period (0 → iteration)
    lr_decay_rate: float = 0.5  # step decay factor
    grad_clip: float = 0.0  # global-norm gradient clipping (0 = off)
    # per-class loss weight multipliers (len == num_class; composes with
    # per-point weights from the event file); empty = uniform
    class_weights: tuple = ()
    auto_resume: bool = False  # resume from latest weight_prefix ckpt
    max_to_keep: int = 0  # checkpoint retention; 0 = keep all
    augment: bool = False  # host-side train augmentation (z-rot/scale/jitter)
    # stop when val_loss hasn't improved for N consecutive validations
    # (0 = never; requires --val_file)
    early_stop_patience: int = 0
    # io
    io_type: str = "h5"  # h5 | npz | csv | dgb | synthetic
    input_file: str = ""
    output_file: str = ""
    val_file: str = ""  # held-out events; evaluated at report steps
    val_batches: int = 4
    data_key: str = "data"
    label_key: str = "label"
    weight_key: str = ""
    shuffle: bool = True
    buckets: tuple = (1024, 4096, 16384, 32768)
    prefetch: int = 2
    crop_mode: str = "random"  # oversized-event crop: random | stride
    # checkpoint / logging
    model_path: str = ""
    weight_prefix: str = "weights/snapshot"
    log_dir: str = "log"
    debug: bool = False
    profile_dir: str = ""
    tensorboard: bool = False
    # TPU-native execution
    num_devices: int = 0  # 0 → all local devices
    point_shards: int = 1  # context parallelism: shard the point axis
    use_pallas: bool = True
    remat: bool = False  # rematerialize EdgeConv blocks in backward
    precision: str = "default"  # default | highest | bfloat16
    # kNN score-matmul precision: "highest" (default) keeps neighbor
    # indices bit-exact vs the f32 oracle; "default" runs the MXU in
    # single-pass bf16 — ~18% faster 131k steps, may swap
    # near-equidistant neighbors (harmless for training quality)
    knn_precision: str = "highest"
    # rebuild the dynamic kNN graph every N EdgeConv blocks (1 = every
    # block, the reference's semantics; higher values reuse neighbor
    # indices across blocks — a large speed win at big N for a small,
    # measured accuracy cost, see BASELINE.md)
    knn_every: int = 1
    # banded sub-quadratic kNN: 0 = exact (reference semantics); > 0
    # sorts each event along a Morton curve once and restricts every
    # graph build to this many consecutive sorted positions per query —
    # O(N·window) instead of O(N²), the long-context lever at 100k+
    # points (measured recall/accuracy in BASELINE.md). MODEL-DEFINING:
    # inference/export adopt it from the checkpoint
    knn_window: int = 0
    # ring mechanism for context-parallel graph builds: "ppermute"
    # (unrolled shard_map steps) or "rdma" (one fused Pallas kernel per
    # device, explicit inter-chip DMA overlapped with the merge)
    ring_impl: str = "ppermute"
    # stacked shared-MLP convs per EdgeConv block (model-defining —
    # changes parameter shapes; SURVEY §0.6 tags the reference depth
    # [M], "possibly 2"). 1 = the factorized production path; >=2 adds
    # per-edge conv+BN+relu stages before max-aggregation
    block_convs: int = 1
    # factorize the first head-MLP dense over the [agg, pooled-global]
    # concat (agg @ W_a + broadcast(g @ W_g)): the (B, N, sumC + feat)
    # concat never exists and the pooled rows are multiplied once per
    # event. Measurably NOT bitwise vs the concat form, so MODEL-DEFINING
    # (inference/export adopt it from the checkpoint; param shapes are
    # unchanged either way). Since round 4 an optional SPEED knob at the
    # frontier (the streamed head reaches 1M+ at default semantics —
    # BASELINE.md long-context frontier).
    head_factorized: bool = False
    # streamed (chunk-scanned) head: "auto" (default) engages it only at
    # the >=2**30-row-element frontier (1M+ points) where the dense
    # head's per-point activations OOM; "on" forces it at any size;
    # "off" never streams. NOT model-defining (eval output is bitwise
    # the dense head's — hardware-pinned by benchmarks/tpu_gate.py;
    # train stats differ only by f32 summation order), so unlike
    # head_factorized it is NOT adopted from checkpoints
    head_stream: str = "auto"
    # run structurally-identical runs of EdgeConv blocks as ONE lax.scan
    # over stacked params (models.dgcnn ModelSpec.block_scan): "auto"
    # (default) engages in train mode at >= 2**21 rows (the measured line
    # where the UNROLLED backward's per-block while-body temps fragment
    # the allocator past one chip's HBM — the 2M-train enabler); "on"
    # forces it; "off" never scans. NOT model-defining (same per-block
    # ops — an implementation knob like block_impl)
    block_scan: str = "auto"
    # EdgeConv block implementation: "auto" (default) silently picks the
    # fastest measured form for the config — "fused" for f32 depth-1
    # blocks (slot-loop custom-VJP backward: 9-15% faster train steps
    # than "edge" across regimes AND O(N·C) backward memory, the 512k
    # single-chip-training enabler — BASELINE.md), "edge" otherwise.
    # "edge" is the classic materializing form (XLA fuses it into one
    # traversal); "reduced" never materializes the (B,N,k,D) edge tensor
    # (selection commutes with the monotone BN+relu chain; statistics
    # factor over the edge sum — see ops.edge.edgeconv_block_reduced).
    # All forms give bitwise-identical predictions in eval mode; an
    # implementation knob like use_pallas
    block_impl: str = "auto"

    def __post_init__(self):
        if self.edge_filters is None:
            self.edge_filters = (64,) * self.num_edge_conv
        else:
            self.edge_filters = tuple(self.edge_filters)
            self.num_edge_conv = len(self.edge_filters)
        self.head_mlp = tuple(self.head_mlp)
        self.class_weights = tuple(self.class_weights or ())
        self.buckets = tuple(sorted(self.buckets))

    def model_spec(self) -> ModelSpec:
        return ModelSpec(
            num_class=self.num_class,
            k=self.kvalue,
            edge_filters=tuple(self.edge_filters),
            residual=(self.model_name == "residual-dgcnn"),
            head_feat_dim=self.head_feat_dim,
            head_mlp=tuple(self.head_mlp),
            global_pool=self.global_pool,
            dropout=self.dropout,
            bn_momentum=self.bn_momentum,
            compute_dtype=(
                "bfloat16" if self.precision == "bfloat16" else "float32"
            ),
            remat=self.remat,
            knn_every=self.knn_every,
            knn_window=self.knn_window,
            block_impl=self.block_impl,
            block_convs=self.block_convs,
            head_factorized=self.head_factorized,
            head_stream=self.head_stream,
            block_scan=self.block_scan,
        )

    def validate(self):
        """Fail fast on inconsistent flags (before any compilation)."""
        if self.kvalue < 1:
            raise ValueError(f"KVALUE must be >= 1, got {self.kvalue}")
        min_n = self.num_point or (min(self.buckets) if self.buckets else 0)
        if min_n and self.kvalue > min_n:
            raise ValueError(
                f"KVALUE={self.kvalue} exceeds the smallest padded event "
                f"size {min_n} (num_point/buckets)"
            )
        if self.minibatch_size < 1 and not (
            self.command == "export" and self.minibatch_size == 0
        ):
            # export accepts -mb 0: shape-polymorphic (any-batch) artifact
            raise ValueError("MINIBATCH_SIZE must be >= 1")
        if self.num_class < 2:
            raise ValueError(f"NUM_CLASS must be >= 2, got {self.num_class}")
        if self.point_shards < 1:
            raise ValueError("point_shards must be >= 1")
        if self.class_weights:
            if len(self.class_weights) != self.num_class:
                raise ValueError(
                    f"--class_weights needs {self.num_class} values "
                    f"(one per class), got {len(self.class_weights)}"
                )
            for w in self.class_weights:
                if not isinstance(w, (int, float)) or not (w > 0):
                    # zero/negative weights make the weighted-mean
                    # denominator collapse (loss/=max(w_sum,1e-9) then
                    # explodes); strings from JSON die opaquely later
                    raise ValueError(
                        f"--class_weights must be positive numbers, "
                        f"got {w!r}"
                    )
        if self.early_stop_patience < 0:
            raise ValueError("early_stop_patience must be >= 0")
        if self.early_stop_patience and not self.val_file:
            raise ValueError("--early_stop_patience requires --val_file")
        if self.knn_every < 1:
            raise ValueError(f"knn_every must be >= 1, got {self.knn_every}")
        if self.knn_window < 0:
            raise ValueError(
                f"knn_window must be >= 0, got {self.knn_window}"
            )
        if self.knn_window and self.knn_window < self.kvalue:
            raise ValueError(
                f"knn_window={self.knn_window} is smaller than "
                f"KVALUE={self.kvalue}: every query needs at least k "
                f"candidates in its band"
            )
        if self.knn_window and self.point_shards > 1:
            # banded CP exchanges window-sized halos with the immediate
            # ring neighbors only (kernels.halo_knn), so every shard must
            # be at least one window wide. Validate the PADDED event
            # sizes the batcher actually produces (io.batching rounds
            # every bucket up to the 128-point lane width), not the raw
            # configured values.
            from dgcnn_tpu.io.batching import _round_up

            for raw in ((self.num_point,) if self.num_point else self.buckets or ()):
                n = _round_up(int(raw))
                if n % self.point_shards:
                    raise ValueError(
                        f"padded event size {n} (configured {raw}, rounded "
                        f"to the 128-point lane width) not divisible by "
                        f"point_shards={self.point_shards}"
                    )
                if self.knn_window > n // self.point_shards:
                    raise ValueError(
                        f"knn_window={self.knn_window} exceeds the local "
                        f"shard size {n // self.point_shards} (= padded "
                        f"event size {n} / {self.point_shards} shards): "
                        f"the halo-exchange banded CP needs window <= "
                        f"points per shard. Use fewer point shards, a "
                        f"smaller window, or the exact ring (knn_window=0)."
                    )
            if self.ring_impl == "rdma":
                raise ValueError(
                    "--ring_impl rdma does not apply to banded context "
                    "parallelism (--knn_window with point_shards > 1): the "
                    "banded path exchanges halos, not ring blocks. Drop "
                    "--ring_impl or use knn_window=0 for the exact RDMA ring."
                )
        if self.block_convs < 1:
            raise ValueError(
                f"block_convs must be >= 1, got {self.block_convs}"
            )
        if self.head_factorized and self.global_pool and not self.head_mlp:
            raise ValueError(
                "head_factorized needs at least one head_mlp layer to "
                "factorize (the output dense would otherwise consume the "
                "concat directly)"
            )
        enums = {
            "precision": ("default", "highest", "bfloat16"),
            "knn_precision": ("highest", "default"),
            "io_type": ("h5", "npz", "csv", "dgb", "synthetic", "larcv"),
            "lr_schedule": ("constant", "cosine", "step"),
            "crop_mode": ("random", "stride"),
            "optimizer": ("adam", "adamw", "sgd", "momentum"),
            "ring_impl": ("ppermute", "rdma"),
            "block_impl": ("auto", "edge", "reduced", "fused"),
            "head_stream": ("auto", "on", "off"),
            "block_scan": ("auto", "on", "off"),
        }
        # argparse `choices` only guards CLI-supplied values; --config
        # files and programmatic Configs land here instead (a typo like
        # precision="bf16" would otherwise silently train in f32)
        for field, allowed in enums.items():
            if getattr(self, field) not in allowed:
                raise ValueError(
                    f"{field} must be one of {allowed}, "
                    f"got {getattr(self, field)!r}"
                )
        if self.command == "inference" and not self.model_path:
            raise ValueError("inference requires --model_path")
        if self.command == "export":
            if not self.model_path:
                raise ValueError("export requires --model_path")
            if not self.output_file:
                raise ValueError("export requires --output_file")
            if self.num_point <= 0:
                raise ValueError(
                    "export requires --num_point (static serving shape)"
                )
        return self

    def summary(self) -> str:
        """One flag per line, reference-style startup echo."""
        d = dataclasses.asdict(self)
        return "\n".join(f"  {k:18s} = {d[k]}" for k in sorted(d))

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=list)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


def _add_common_flags(p: argparse.ArgumentParser):
    p.add_argument("-c", "--config", default=None, metavar="FILE.json",
                   help="load flag defaults from a JSON config (e.g. a "
                   "checkpoint's embedded config or Config.to_json()); "
                   "explicit CLI flags override")
    g = p.add_argument_group("model")
    g.add_argument("-mn", "--model_name", default="dgcnn",
                   help="dgcnn | residual-dgcnn (reference MODEL_NAME)")
    g.add_argument("-nc", "--num_class", type=int, default=2)
    g.add_argument("-k", "--kvalue", type=int, default=20,
                   help="neighbor count for the dynamic kNN graph")
    g.add_argument("-ec", "--num_edge_conv", type=int, default=6)
    g.add_argument("--edge_filters", type=int, nargs="*", default=None,
                   help="per-block EdgeConv widths; overrides num_edge_conv")
    g.add_argument("--head_feat_dim", type=int, default=1024)
    g.add_argument("--head_mlp", type=int, nargs="*", default=[512, 256])
    g.add_argument("--no_global_pool", dest="global_pool", action="store_false")
    g.add_argument("--dropout", type=float, default=0.0)
    g.add_argument("--bn_momentum", type=float, default=0.9)
    g.add_argument("--no_bn_sync", dest="bn_sync", action="store_false",
                   help="per-tower BN statistics (reference semantics) "
                   "instead of cross-replica sync BN")

    g = p.add_argument_group("io")
    g.add_argument("-io", "--io_type", default="h5",
                   choices=["h5", "npz", "csv", "dgb", "larcv", "synthetic"])
    g.add_argument("-if", "--input_file", default="")
    g.add_argument("-of", "--output_file", default="")
    g.add_argument("-vf", "--val_file", default="",
                   help="held-out event file; evaluated at report steps")
    g.add_argument("--val_batches", type=int, default=4)
    g.add_argument("--data_key", default="data")
    g.add_argument("--label_key", default="label")
    g.add_argument("--weight_key", default="")
    g.add_argument("-mb", "--minibatch_size", type=int, default=4)
    g.add_argument("-np", "--num_point", type=int, default=0,
                   help="fixed point budget per event; 0 = bucketed")
    g.add_argument("--buckets", type=int, nargs="*",
                   default=[1024, 4096, 16384, 32768])
    g.add_argument("--prefetch", type=int, default=2)
    g.add_argument("--no_shuffle", dest="shuffle", action="store_false")
    g.add_argument("--crop_mode", default="random",
                   choices=["random", "stride"],
                   help="oversized-event subsampling: seeded stratified "
                   "random (default) or deterministic stride; identical "
                   "across all readers incl. the C++ DGB path")

    g = p.add_argument_group("run")
    g.add_argument("--seed", type=int, default=123)
    g.add_argument("-mp", "--model_path", default="",
                   help="checkpoint to restore (resume / inference)")
    g.add_argument("-wp", "--weight_prefix", default="weights/snapshot")
    g.add_argument("-ld", "--log_dir", default="log")
    g.add_argument("--debug", action="store_true")
    g.add_argument("--profile_dir", default="")
    g.add_argument("--tensorboard", action="store_true",
                   help="also write TensorBoard scalar summaries")

    g = p.add_argument_group("tpu")
    g.add_argument("-nd", "--num_devices", type=int, default=0,
                   help="data-parallel device count (0 = all local devices)")
    g.add_argument("-ps", "--point_shards", type=int, default=1,
                   help="context parallelism: shard each event's points "
                   "over this many devices (ring kNN over ICI)")
    g.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    g.add_argument("--precision", default="default",
                   choices=["default", "highest", "bfloat16"])
    g.add_argument("--knn_precision", default="highest",
                   choices=["highest", "default"],
                   help="kNN score-matmul precision: highest = bit-exact "
                   "neighbor graph vs the f32 oracle; default = bf16 MXU "
                   "(faster at 100k+ points, near-ties may swap)")
    g.add_argument("--knn_every", type=int, default=1,
                   help="rebuild the dynamic kNN graph every N EdgeConv "
                   "blocks (1 = reference per-block semantics; higher "
                   "reuses the graph — big speedup at large NUM_POINT, "
                   "small measured accuracy cost)")
    g.add_argument("--knn_window", type=int, default=0,
                   help="banded sub-quadratic kNN: 0 = exact (reference "
                   "semantics); > 0 sorts each event along a Morton "
                   "curve and restricts every graph build to this many "
                   "consecutive sorted positions per query — O(N*W) "
                   "instead of O(N^2) at 100k+ points (model-defining; "
                   "recall/accuracy measured in BASELINE.md)")
    g.add_argument("--ring_impl", default="ppermute",
                   choices=["ppermute", "rdma"],
                   help="context-parallel ring mechanism: ppermute = "
                   "XLA collectives; rdma = fused Pallas ring kernel "
                   "(explicit ICI DMA overlapped with the top-k merge)")
    g.add_argument("--remat", action="store_true",
                   help="recompute each EdgeConv block in backward "
                   "(trade FLOPs for HBM at large NUM_POINT)")
    g.add_argument("--block_convs", type=int, default=1,
                   help="stacked shared-MLP convs per EdgeConv block "
                   "(1 = factorized production path; >=2 adds per-edge "
                   "conv+BN+relu stages before max — paper-style blocks; "
                   "model-defining)")
    g.add_argument("--head_factorized", action="store_true",
                   help="factorize the first head-MLP dense over the "
                   "[agg, pooled-global] concat (the concat tensor never "
                   "exists; pooled rows multiplied once per event). NOT "
                   "bitwise vs the concat form -> model-defining "
                   "(adopted from checkpoints). An optional speed knob "
                   "at the 1M+ frontier")
    g.add_argument("--head_stream", default="auto",
                   choices=["auto", "on", "off"],
                   help="streamed (chunk-scanned) head: auto = engage at "
                   "the >=2**30-row-element frontier (1M+ points) where "
                   "the dense head OOMs; on = force at any size; off = "
                   "never. Eval output is bitwise the dense head's "
                   "(hardware-pinned), so NOT model-defining — an "
                   "implementation knob like block_impl")
    g.add_argument("--block_scan", default="auto",
                   choices=["auto", "on", "off"],
                   help="run structurally-identical EdgeConv block runs "
                   "as one lax.scan over stacked params: auto = engage "
                   "in train mode at the >=2**21-row frontier (2M+ "
                   "points) where the unrolled backward fragments the "
                   "allocator past HBM; on = force; off = never. Same "
                   "per-block ops -> NOT model-defining (implementation "
                   "knob like block_impl)")
    g.add_argument("--block_impl", default="auto",
                   choices=["auto", "edge", "reduced", "fused"],
                   help="EdgeConv block implementation: auto = fastest "
                   "measured form for the config (fused for f32 depth-1 "
                   "blocks, edge otherwise); edge = classic "
                   "materializing form; reduced = never materializes "
                   "the (B,N,k,D) edge tensor (bitwise-identical eval "
                   "predictions); fused = reduced forward + analytic "
                   "custom VJP (slot-loop scatter backward, O(N*C) "
                   "memory)")


def build_parser(defaults: dict | None = None) -> argparse.ArgumentParser:
    """``defaults`` (from --config) override argument-level defaults on
    every subcommand; explicit CLI flags still win over both."""
    p = argparse.ArgumentParser(
        prog="dgcnn_tpu",
        description="TPU-native dynamic graph CNN trainer for sparse 3D "
        "point-cloud semantic segmentation",
    )
    sub = p.add_subparsers(dest="command", required=True)
    tr = sub.add_parser("train", help="train a model")
    _add_common_flags(tr)
    tr.add_argument("-i", "--iteration", type=int, default=10000)
    tr.add_argument("-rs", "--report_step", type=int, default=100)
    tr.add_argument("-cs", "--checkpoint_step", type=int, default=500)
    tr.add_argument("-lr", "--learning_rate", type=float, default=1e-3)
    tr.add_argument("-opt", "--optimizer", default="adam",
                    choices=["adam", "adamw", "sgd", "momentum"])
    tr.add_argument("--lr_schedule", default="constant",
                    choices=["constant", "cosine", "step"])
    tr.add_argument("--lr_decay_steps", type=int, default=0,
                    help="cosine horizon / step period (0 = --iteration)")
    tr.add_argument("--lr_decay_rate", type=float, default=0.5)
    tr.add_argument("--class_weights", type=float, nargs="+", default=(),
                    help="per-class loss weight multipliers (one per "
                    "class; composes with per-point file weights)")
    tr.add_argument("--grad_clip", type=float, default=0.0,
                    help="clip gradients to this global norm (0 = off) — "
                    "guards against outlier-event gradient spikes")
    tr.add_argument("--auto_resume", action="store_true",
                    help="resume from the latest weight_prefix checkpoint "
                    "if one exists (preemption-friendly)")
    tr.add_argument("--max_to_keep", type=int, default=0,
                    help="keep only the newest N checkpoints "
                    "(0 = keep all; the reference Saver keeps 5)")
    tr.add_argument("--early_stop_patience", type=int, default=0,
                    help="stop when val_loss hasn't improved for N "
                    "consecutive validations (0 = never; needs -vf)")
    tr.add_argument("--augment", action="store_true",
                    help="seeded train-time augmentation on the host: "
                    "random z-rotation, scale 0.95-1.05, coord jitter")

    inf = sub.add_parser("inference", help="run inference + write-back")
    _add_common_flags(inf)
    inf.add_argument("-i", "--iteration", type=int, default=0,
                     help="max batches (0 = whole input file)")

    exp = sub.add_parser(
        "export", help="serialize a checkpoint to a serving artifact"
    )
    _add_common_flags(exp)
    sub.add_parser(
        "info", help="print environment/runtime diagnostics and exit"
    )
    if defaults:
        for sp in (tr, inf, exp):
            sp.set_defaults(**defaults)
    return p


def parse_args(argv=None) -> Config:
    import sys as _sys

    argv = list(_sys.argv[1:] if argv is None else argv)
    # --config file.json provides DEFAULTS; explicit CLI flags override.
    # The path is extracted by EXACT token scan, not a pre-parser:
    # argparse's prefix/joined-short matching would otherwise eat the
    # documented -cs (checkpoint_step) as "-c s" and abbreviations like
    # --conf, breaking unrelated invocations.
    config_path = None
    rest = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if tok in ("-c", "--config"):
            if i + 1 >= len(argv):
                raise SystemExit(f"{tok} requires a file path")
            config_path = argv[i + 1]
            i += 2
            continue
        if tok.startswith("--config="):
            config_path = tok.split("=", 1)[1]
            i += 1
            continue
        rest.append(tok)
        i += 1
    overrides = None
    if config_path:
        with open(config_path) as f:
            loaded = json.load(f)
        fields = {f_.name for f_ in dataclasses.fields(Config)}
        unknown = sorted(set(loaded) - fields)
        if unknown:
            raise SystemExit(
                f"--config {config_path}: unknown keys {unknown}"
            )
        skip = {"command"}  # the subcommand comes from the CLI
        requested = next((t for t in rest if not t.startswith("-")), None)
        if requested != "train" and "iteration" in loaded:
            # `iteration` means train STEPS on train but MAX BATCHES
            # (0 = whole file) on inference — a train config applied to
            # inference would silently truncate the prediction file.
            # Skip it, but LOUDLY (the repo convention is no silent drops)
            print(
                f"--config: skipping train-only key 'iteration' for "
                f"{requested} (pass -i explicitly to bound batches)",
                flush=True,
            )
            skip.add("iteration")
        overrides = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in loaded.items()
            if k not in skip
        }
    ns = build_parser(overrides).parse_args(rest)
    d = vars(ns)
    if d.pop("config", None) is not None:
        # the exact-token scan above is the only supported spelling; a
        # joined -cFILE or abbreviated --conf reaching the real parser
        # would otherwise be silently DISCARDED here
        raise SystemExit(
            "--config must be passed as '-c FILE', '--config FILE' or "
            "'--config=FILE' (joined/abbreviated forms are not supported)"
        )
    if d.get("edge_filters") is None:
        d["edge_filters"] = None
    return Config.from_dict(d)


def print_info() -> int:
    """`dgcnn_tpu info`: the environment facts a deployment bug report
    needs — versions, backend, devices, native-IO build status."""
    import platform

    import dgcnn_tpu

    print(f"dgcnn_tpu   {dgcnn_tpu.__version__}")
    print(f"python      {platform.python_version()} ({platform.machine()})")
    import jax

    print(f"jax         {jax.__version__}")
    try:
        devs = jax.devices()
        print(f"backend     {jax.default_backend()} ({len(devs)} device(s))")
        for d in devs[:8]:
            print(f"  - {d}")
        if len(devs) > 8:
            print(f"  ... and {len(devs) - 8} more")
    except Exception as e:  # no usable backend is itself the diagnosis
        print(f"backend     UNAVAILABLE: {e}")
    print(
        f"multi-host  process {jax.process_index()}/{jax.process_count()}"
    )
    from dgcnn_tpu.io import native

    lib = native.load()
    print(
        "native IO   "
        + ("libdgbio.so loaded (C++ batch assembler active)"
           if lib is not None
           else "unavailable (pure-Python DGB fallback in use)")
    )
    return 0
