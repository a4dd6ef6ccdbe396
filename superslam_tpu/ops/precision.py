"""f32 matmul precision control for the geometry/solver programs.

On TPU, XLA's default precision for f32 dot/conv operands is a single
bf16x bf16 MXU pass (~8 mantissa bits per input). That is the right trade
for the neural front-end (SuperPoint/LightGlue already cast to bfloat16
on purpose), but it silently corrupts the GEOMETRY math: pose-only LM
normal equations, SE(3) retractions, landmark transforms and support
residuals are f32 chains whose ~1e-3 per-op error compounds across a
trajectory. Measured end-to-end on the rendered 150-frame circuit
(scripts/accuracy_suite.py --platform axon): device-tracked ATE was
0.2757 m at default precision vs 0.0705 m host-solved when this wrapper
was written (round 4).

Round-5 postscript (2026-08-20, ACCURACY.json tpu_legs): the round-4
attribution was WRONG, or at least incomplete. After the pose-adoption
re-anchor fix (commit 5439d2d) the on-hardware kill-switch A/B shows
stereo_devkf 0.0738 m with the wrapper vs 0.0693 m with it disabled
(stereo_devkf_f32off) — statistically indistinguishable; the 0.2757 m
failure was the adoption-algebra bug, not MXU input rounding. The wrapper
is kept because running f64-oracle-pinned f32 geometry chains through
bf16-rounded MXU passes is wrong in principle and free in practice (the
solver programs are a negligible share of device time), but it is no
longer claimed to be accuracy-critical on the measured circuit.

Every solver / fused-tracking program builder is therefore wrapped in
``highest_f32_matmuls``: f32 operands use the multi-pass (f32-exact)
MXU algorithm, while explicitly-bf16 neural matmuls are unaffected (the
precision knob only raises the algorithm for wider-than-bf16 operands).
On CPU this is a no-op — which is why the CPU oracle tests never saw it.
"""

from __future__ import annotations

import functools
import os

import jax

# Read ONCE at import: ambient precision is not part of jit's cache key, so
# flipping the env var after a program has compiled in-process would silently
# return the cached executable traced at the old precision. Making it a
# module constant gives the kill-switch honest process-restart semantics —
# an A/B is two processes, never one.
F32_PRECISION_MODE = os.environ.get("SUPERSLAM_F32_PRECISION", "highest")


def highest_f32_matmuls(fn):
    """Trace ``fn`` with jax.default_matmul_precision('highest').

    SUPERSLAM_F32_PRECISION overrides the mode (one of jax's
    default/high/highest/bfloat16/float32 ...; '0' or 'default' restores
    the XLA default — the A/B kill-switch for the solver-precision fix).
    The env var is read once at import (see F32_PRECISION_MODE above):
    set it before starting the process, not mid-run."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        if F32_PRECISION_MODE in ("0", "", "default"):
            return fn(*args, **kwargs)
        with jax.default_matmul_precision(F32_PRECISION_MODE):
            return fn(*args, **kwargs)

    return wrapped


def default_matmul_precision(fn):
    """Trace ``fn`` at jax.default_matmul_precision('default').

    The Pallas entry points are decorated with this to undo an enclosing
    ``highest_f32_matmuls`` scope: Mosaic rejects an fp32 contract
    precision on bf16 kernel operands (``vector<...xbf16>`` dot with
    ``#tpu.contract_precision<fp32>`` fails to lower), and the kernels
    already choose their own operand dtypes explicitly."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("default"):
            return fn(*args, **kwargs)

    return wrapped
