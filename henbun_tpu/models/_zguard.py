"""Shared trainable-inducing-point guard for the evidence families.

The reference trains inducing points as a plain Variable
(`/root/reference/Henbun/gp/gp.py:86-97`). Under EVIDENCE objectives that
is unsafe as-is: the evidence gradient drives neighboring points into
collision (measured: min spacing 0.047 -> 5.6e-4 by step 115 at n=1e5,
m=128, then a Cholesky-gradient NaN — see `gp.gp.z_repulsion`). Every
evidence family (`SparseGPC`, `SparseGPRobust`, `SparseGPMulticlass`)
therefore freezes z by default and, when ``train_z=True``, subtracts this
repulsion barrier from its objective so collisions are impossible while
spacings above the barrier onset remain completely unconstrained.
"""
from __future__ import annotations

# Evidence-family abort hint: the Optimizer's nan-guard names this instead
# of the natural-gradient pairing rule when a run goes non-finite twice in
# a row (model.py's abort path reads `model._nan_hint`).
EVIDENCE_NAN_HINT = (
    "Likely causes in an evidence family: (a) colliding inducing points — "
    "with train_z=True the repulsion barrier should prevent this, check "
    "gp.gp.z_min_spacing(model.gp.z.value); (b) likelihood/kernel scale "
    "beyond float32 — the multiclass engine's square-root curvature path "
    "lifts the old n*k_var ~ 2e5 per-class envelope, but custom engines "
    "forming I + A^T W A directly still round its unit eigenvalue floor "
    "away (subsample or reduce k_var); (c) settings.numerics.jitter_level "
    "below the measured 1e-4 Cholesky-gradient floor (docs/PERF.md)."
)


def setup_z_guard(model, z, train_z, z_penalty, n_data):
    """Record barrier constants on `model` at setUp time.

    d0 (barrier onset) = half the INITIAL min spacing: quantile-initialized
    z starts everywhere above d0, so the barrier starts exactly inactive and
    only ever engages when training actually closes a gap. weight defaults
    to n_data (evidence gradients are O(n)); override with ``z_penalty``.
    """
    from ..gp.gp import z_min_spacing

    model._nan_hint = EVIDENCE_NAN_HINT
    model._train_z = bool(train_z)
    s0 = z_min_spacing(z)
    model._z_d0 = 0.5 * s0 if s0 > 0 else 1e-3
    model._z_rep_weight = (
        float(z_penalty) if z_penalty is not None else float(n_data)
    )


def z_guard(model):
    """The barrier term to SUBTRACT from an evidence objective (0 when z is
    frozen — no penalty is traced at all)."""
    if not model._train_z:
        return 0.0
    from ..gp.gp import z_repulsion

    return z_repulsion(model.gp.z, model._z_d0, model._z_rep_weight)
