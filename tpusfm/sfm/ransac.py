"""Fixed-size batched hypothesize-and-verify RANSAC.

The reference's robust estimation is OpenMVG AC-RANSAC inside ``filter()``
(src/sparseBuilder/sparseBuilder.cpp:1160-1237: F-model, 4 px, 2048 iters)
and cv::findEssentialMat / solvePnPRansac in the hand-rolled path
(src/actuator/SequentialActuator.h:108-110, 175-177).  Those are
data-dependent sequential loops; on TPU the whole hypothesis set becomes one
batched array program (SURVEY.md §7 hard part 1):

  1. draw (n_iters, sample_size) correspondence indices at once,
  2. run the minimal solver vmapped over hypotheses,
  3. score all hypotheses against all correspondences as one (I, N) matrix,
  4. argmax inlier count, then one weighted least-squares refit on the
     winner's inliers.

Degenerate samples yield low-scoring models and lose the argmax — no
rejection branching needed.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _sample_indices(key, valid: jnp.ndarray, n_iters: int, sample_size: int):
    """Draw correspondence indices ~ uniform over valid slots. (I, S) int32.
    Uses Gumbel-top-k per hypothesis so samples are without replacement."""
    n = valid.shape[-1]
    g = jax.random.gumbel(key, (n_iters, n))
    logits = jnp.where(valid, 0.0, -jnp.inf) + g
    _, idx = jax.lax.top_k(logits, sample_size)
    return idx


@partial(jax.jit, static_argnames=("solver", "scorer", "sample_size", "n_iters", "refit"))
def ransac(
    key: jax.Array,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    valid: jnp.ndarray,
    solver: Callable,
    scorer: Callable,
    sample_size: int,
    n_iters: int = 512,
    inlier_thresh: float = 4.0,
    refit: bool = True,
):
    """Generic two-array RANSAC.

    solver(x0s, x1s, w=None) -> model (batched over a leading dim);
    scorer(model, x0, x1) -> squared errors (..., N).
    inlier_thresh is in the scorer's units (threshold on sqrt(error)).

    Returns (model, inliers (N,) bool, n_inliers).
    """
    k1, _ = jax.random.split(key)
    idx = _sample_indices(k1, valid, n_iters, sample_size)  # (I, S)
    models = solver(x0[idx], x1[idx])  # (I, ...)
    errs = scorer(models, x0[None], x1[None])  # (I, N)
    t2 = inlier_thresh * inlier_thresh
    inl = (errs < t2) & valid[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    best_inl = inl[best]
    if refit:
        w = best_inl.astype(x0.dtype)
        refit_model = solver(x0, x1, w)
        errs_r = scorer(refit_model, x0, x1)
        inl_r = (errs_r < t2) & valid
        # Keep the refit only if it didn't lose support (guards degenerate
        # all-inlier LSQ on contaminated sets).
        better = jnp.sum(inl_r) >= jnp.sum(best_inl)
        best_model = jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), refit_model, best_model
        )
        best_inl = jnp.where(better, inl_r, best_inl)
    return best_model, best_inl, jnp.sum(best_inl)


# ---------------------------------------------------------------------------
# Ready-made robust estimators (capability parity with filter()'s
# f/e/h model options, sparseBuilder.cpp:1037-1040)
# ---------------------------------------------------------------------------

def ransac_fundamental(key, uv0, uv1, valid, n_iters=512, thresh_px=4.0):
    from ..core import epipolar

    return ransac(
        key, uv0, uv1, valid,
        solver=epipolar.fundamental_8pt,
        scorer=epipolar.sampson_error,
        sample_size=8, n_iters=n_iters, inlier_thresh=thresh_px,
    )


def ransac_essential(key, x0n, x1n, valid, n_iters=512, thresh_norm=4.0 / 800.0):
    """On normalized coords; thresh defaults to ~4px at f=800."""
    from ..core import epipolar

    return ransac(
        key, x0n, x1n, valid,
        solver=epipolar.essential_8pt,
        scorer=epipolar.sampson_error,
        sample_size=8, n_iters=n_iters, inlier_thresh=thresh_norm,
    )


def ransac_homography(key, uv0, uv1, valid, n_iters=512, thresh_px=4.0):
    from ..core import homography

    return ransac(
        key, uv0, uv1, valid,
        solver=homography.homography_dlt,
        scorer=homography.homography_transfer_error,
        sample_size=4, n_iters=n_iters, inlier_thresh=thresh_px,
    )
