"""Pipeline configuration.

The reference has NO config system — every knob is a hard-coded local at
the top of each stage method (SURVEY.md §5 'Config / flag system', e.g.
describer preset sparseBuilder.cpp:579, ratio .cpp:812, geometric model
.cpp:1037, engine .cpp:1289).  Here the exact same knobs are real,
serializable dataclass fields with the reference's values as defaults."""

from __future__ import annotations

import dataclasses
import json
from typing import Literal

from ..ba.bundle_adjust import BAConfig
from ..dense.depth import DenseConfig
from ..features.sift import SiftConfig
from ..sfm.incremental import IncrementalConfig


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    pair_mode: Literal["exhaustive", "contiguous"] = "exhaustive"  # .cpp:786
    contiguous_window: int = 5
    ratio: float = 0.8                 # NN dist ratio (.cpp:812)
    cross_check: bool = True
    pair_chunk: int = 32               # device batch of pairs per dispatch
    # Preemptive prefilter (parity: sparseBuilder.cpp:819-820, 965-981):
    # match only the strongest K features per view first and drop pairs
    # below the survivor threshold — the reference's large-collection
    # scale lever.
    preemptive: bool = False
    preemptive_features: int = 200     # .cpp:819 (top 200 features)
    preemptive_min_matches: int = 4
    # Loop-closure / revisit pairs by pooled-descriptor retrieval (the
    # capability the reference reaches via exhaustive pairing + scalable
    # matchers, sparseBuilder.cpp:786, 909-944): with contiguous pairing on
    # long sequences, drift is unbounded without them.  Adds top-k revisit
    # candidates per view outside the contiguous window; full matching +
    # geometric filtering verify each candidate.
    loop_closure: bool = False
    loop_top_k: int = 3
    loop_min_sim: float = 0.5


@dataclasses.dataclass(frozen=True)
class GeometricFilterConfig:
    model: Literal["f", "e", "h", "none"] = "f"  # default 'f' (.cpp:1037)
    thresh_px: float = 4.0             # AC-RANSAC precision (.cpp:1039)
    max_iterations: int = 256          # reference runs up to 2048 (.cpp:1040)
    min_matches: int = 50              # pair prune (.cpp:1204)
    min_inlier_ratio: float = 0.3      # E-variant prune (.cpp:1196-1212)
    # Minimal-sample hypotheses (7-point F / 5-point E, multi-root) instead
    # of the 8-point: cleaner samples under contamination, like OpenMVG's
    # AC-RANSAC kernels; costlier per hypothesis.
    minimal_solver: bool = False
    # A-contrario NFA scoring (AC-RANSAC/ORSA parity with the reference's
    # filter, sparseBuilder.cpp:1160-1237): the inlier threshold adapts to
    # each pair's noise level, bounded above by thresh_px.
    adaptive: bool = False
    # Hypothesis-selection subset (LO-RANSAC-style): score the I hypotheses
    # on this many matches, classify the winner's inliers on all matches.
    # Cuts the dominant I x N scoring FLOPs ~4x at 1k matches; 0 = full.
    score_subset: int = 256


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    sift: SiftConfig = dataclasses.field(default_factory=SiftConfig)
    matching: MatchingConfig = dataclasses.field(default_factory=MatchingConfig)
    filter: GeometricFilterConfig = dataclasses.field(default_factory=GeometricFilterConfig)
    engine: IncrementalConfig = dataclasses.field(default_factory=IncrementalConfig)
    # Dense stage (plane sweep + PatchMatch refinement, on by default —
    # the reference's DensifyPointCloud IS PatchMatch MVS, main.cpp:161).
    dense: DenseConfig = dataclasses.field(default_factory=DenseConfig)
    # Engine selection (parity: ESfMEngine INCREMENTAL/GLOBAL/STELLAR,
    # .cpp:195-200, 1476-1560; INCREMENTAL is the reference default,
    # .cpp:1289).
    engine_type: Literal["incremental", "global", "stellar"] = "incremental"
    focal_prior_px: float | None = None  # like the hard-coded 2905.88 (main.cpp:124)
    feature_batch: int = 8             # views per SIFT device dispatch
    # RADIAL3 self-calibration (parity: PINHOLE_CAMERA_RADIAL3 default +
    # GroupSharedIntrinsics + ADJUST_ALL BA refine, sparseBuilder.cpp:
    # 480-502, 554-556, 1292-1293): BA refines one shared [f, pp, k1..k3]
    # block per physical camera identity.  Applied when the caller provides
    # camera-identity groups (the staged pipeline derives them from EXIF).
    self_calibrate: bool = True
    # Device-mesh mode (SURVEY.md §2.3; no reference counterpart — the
    # reference is single-host): devices > 1 runs the WHOLE pipeline
    # data-parallel over a jax mesh — matching sharded over view pairs
    # (dist_matching), bundle adjustment sharded over observations
    # (dist_ba), dense depth sweeps sharded over view clusters
    # (dist_dense).  None/1 = single device.
    devices: int | None = None

    def to_json(self) -> str:
        def enc(o):
            if dataclasses.is_dataclass(o):
                return {f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)}
            return o

        return json.dumps(enc(self), indent=2, default=str)


def config_from_overrides(**kw) -> PipelineConfig:
    """Build a PipelineConfig with dotted overrides, e.g.
    config_from_overrides(**{'matching.ratio': 0.7, 'filter.model': 'e'})."""
    cfg = PipelineConfig()
    groups: dict[str, dict] = {}
    top: dict = {}
    for k, v in kw.items():
        if "." in k:
            g, f = k.split(".", 1)
            groups.setdefault(g, {})[f] = v
        else:
            top[k] = v
    for g, fields in groups.items():
        sub = dataclasses.replace(getattr(cfg, g), **fields)
        top[g] = sub
    return dataclasses.replace(cfg, **top)
