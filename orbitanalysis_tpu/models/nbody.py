"""Native TPU N-body integrator with fused on-the-fly orbit detection.

The reference's on-the-fly mode (``/root/reference/orbitanalysis/
track_orbits_onthefly.py:8-58``) is a host-side hook: a running simulation
dumps two snapshots, the tracker reloads both from disk and cross-matches
them.  Here the simulation itself is native to the TPU — a leapfrog/KDK
integrator whose state lives in HBM — and the apsis detector
(:mod:`orbitanalysis_tpu.ops.apsis` semantics) runs *between force
evaluations at arbitrary cadence* with no host round-trips
(BASELINE.json configs[3]).

Force evaluation is MXU-native direct summation: with
``d_ij^2 = |x_i|^2 + |x_j|^2 - 2 x_i.x_j``, the dominant terms are two
``[N,N]x[N,3]``-shaped matmuls (the Gram matrix and the weighted source
sum), which XLA tiles onto the systolic array — the O(N^2) kernel runs at
matmul speed instead of VPU gather speed.

Because membership of tracked particles in halos is *static* here (a halo
is a fixed set of particle indices), the detector skips the sorted-join
entirely: previous and current state are slot-aligned, so the sign-flip
compare is pure elementwise work.  This is the specialization the general
engine cannot make when membership churns.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbitanalysis_tpu.utils.numerics import periodic_displacement


class NBodyState(NamedTuple):
    pos: jnp.ndarray   # [N, 3]
    vel: jnp.ndarray   # [N, 3]
    mass: jnp.ndarray  # [N]


class TrackState(NamedTuple):
    """Slot-aligned detector state for statically-assigned halo members."""

    rhat: jnp.ndarray    # [H, P, 3]
    vrad: jnp.ndarray    # [H, P]
    angles: jnp.ndarray  # [H, P] cumulative angle since last apsis
    counts: jnp.ndarray  # [H, P] int32 apsis passages so far
    primed: jnp.ndarray  # [] bool: first detection only seeds the state


class OrbitNBodyConfig(NamedTuple):
    dt: float
    n_steps: int
    detect_every: int = 1
    mode: str = "pericentric"
    softening: float = 0.05
    G: float = 1.0
    box_size: Optional[float] = None
    angle_cut: float = 0.0
    # fixed detection frames; None = moving mass-weighted member frames
    centers: Optional[jnp.ndarray] = None    # [H, 3]
    bulk_vels: Optional[jnp.ndarray] = None  # [H, 3]


# ----------------------------------------------------------------------
# forces
# ----------------------------------------------------------------------

def direct_forces(
    pos: jnp.ndarray,
    mass: jnp.ndarray,
    softening: float = 0.05,
    G: float = 1.0,
    box_size=None,
) -> jnp.ndarray:
    """Softened direct-summation gravitational acceleration, MXU-shaped.

    Non-periodic path uses the Gram-matrix expansion so the two O(N^2)
    contractions (`pos @ pos.T` and the weighted source reduction) hit the
    MXU.  The periodic path needs per-pair minimum-image displacements, so
    it materializes the [N, N, 3] displacement tensor (fine for the
    region-scale N this integrator targets).
    """
    eps2 = jnp.asarray(softening * softening, pos.dtype)
    if box_size is None:
        sq = jnp.sum(pos * pos, axis=-1)                      # [N]
        # HIGHEST precision: the TPU MXU's default (bf16-pass) matmul
        # rounding can drive the diagonal d2 slightly negative, which
        # rsqrt turns into NaN
        gram = jnp.matmul(
            pos, pos.T, precision=jax.lax.Precision.HIGHEST
        )                                                      # MXU [N,N]
        d2 = (
            jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0) + eps2
        )
        d2 = jnp.maximum(d2, jnp.asarray(1e-18, pos.dtype))
        inv_d3 = jax.lax.rsqrt(d2) / d2                        # 1/d^3
        w = inv_d3 * mass[None, :]                             # [N,N]
        # a_i = G * (sum_j w_ij x_j  -  x_i sum_j w_ij)
        acc = G * (
            jnp.matmul(w, pos, precision=jax.lax.Precision.HIGHEST)
            - pos * jnp.sum(w, axis=1, keepdims=True)
        )
        return acc
    dx = periodic_displacement(pos[None, :, :] - pos[:, None, :], box_size)
    d2 = jnp.sum(dx * dx, axis=-1) + eps2
    inv_d3 = jax.lax.rsqrt(d2) / d2
    w = inv_d3 * mass[None, :]
    return G * jnp.sum(w[..., None] * dx, axis=1)


def make_direct_force_fn(use_pallas: bool = False):
    """A ``force_fn`` for :func:`simulate_with_tracking`.

    ``use_pallas=True`` selects the blocked Pallas kernel
    (:mod:`orbitanalysis_tpu.ops.pallas_nbody`): O(N) memory instead of
    the O(N^2) pair matrix, required beyond a few 10^4 particles; free
    or periodic (minimum-image in-kernel).  For periodic boxes at full
    box scale prefer the PM solver
    (:func:`orbitanalysis_tpu.models.pm.make_pm_force_fn`).
    """
    if not use_pallas:
        return direct_forces

    from orbitanalysis_tpu.ops.pallas_nbody import direct_forces_pallas

    def force(pos, mass, softening=0.05, G=1.0, box_size=None, **_):
        return direct_forces_pallas(
            pos, mass, softening=softening, G=G,
            box_size=None if box_size is None else float(box_size),
        )

    return force


def point_mass_forces(GM: float = 1.0, softening: float = 0.0):
    """Central point-mass field at the origin (Kepler test problems)."""

    def force(pos, mass, **_):
        r2 = jnp.sum(pos * pos, axis=-1) + softening * softening
        inv_r3 = jax.lax.rsqrt(r2) / r2
        return -GM * pos * inv_r3[:, None]

    return force


# ----------------------------------------------------------------------
# KDK leapfrog
# ----------------------------------------------------------------------

def kdk_step(
    state: NBodyState,
    acc: jnp.ndarray,
    dt: float,
    force_fn: Callable,
    box_size=None,
    **force_kwargs,
):
    """One kick-drift-kick step; returns (new_state, new_acc).

    Carrying the acceleration across steps halves the force evaluations
    (the closing kick of step k is the opening kick of step k+1).
    """
    half = 0.5 * dt
    vel_half = state.vel + half * acc
    pos_new = state.pos + dt * vel_half
    if box_size is not None:
        pos_new = jnp.mod(pos_new, box_size)
    acc_new = force_fn(pos_new, state.mass, box_size=box_size, **force_kwargs)
    vel_new = vel_half + half * acc_new
    return NBodyState(pos=pos_new, vel=vel_new, mass=state.mass), acc_new


# ----------------------------------------------------------------------
# fused detection
# ----------------------------------------------------------------------

def init_track_state(n_halos: int, capacity: int, dtype=jnp.float32):
    return TrackState(
        rhat=jnp.zeros((n_halos, capacity, 3), dtype=dtype),
        vrad=jnp.zeros((n_halos, capacity), dtype=dtype),
        angles=jnp.zeros((n_halos, capacity), dtype=dtype),
        counts=jnp.zeros((n_halos, capacity), dtype=jnp.int32),
        primed=jnp.asarray(False),
    )


def _halo_frames(state: NBodyState, members, valid, box_size,
                 center=None, bulk=None, identity=False):
    """Region-frame quantities for statically-assigned halo members.

    ``members``: [H, P] indices into the particle arrays (-1 = padding).
    Unless overridden, centers and bulk velocities are the mass-weighted
    means of each halo's members (the reference's moving-center
    semantics, ``track_orbits.py:267-272``, with the halo's own members
    defining the frame).

    ``identity=True`` asserts that ``members`` is ``arange(n)`` reshaped
    — every particle tracked, in order — and replaces the member
    gathers with free reshapes (TPU gathers cost per index: the three
    gathers here are most of the detection step's time at 10M+ scale).
    """
    h, p = members.shape
    if identity:
        pos = state.pos.reshape(h, p, 3)
        vel = state.vel.reshape(h, p, 3)
        w = valid.astype(pos.dtype) * state.mass.reshape(h, p)
    else:
        idx = jnp.maximum(members, 0)
        pos = state.pos[idx]                       # [H, P, 3]
        vel = state.vel[idx]
        w = valid.astype(pos.dtype) * state.mass[idx]
    denom = jnp.maximum(jnp.sum(w, axis=1), 1e-30)

    if center is None:
        if box_size is not None:
            # mass-weighted circular mean via an anchor member to stay
            # consistent under wrapping: displacements relative to the
            # first valid member, averaged, then re-anchored.
            anchor = pos[:, :1, :]
            rel_anchor = periodic_displacement(pos - anchor, box_size)
            center = anchor[:, 0, :] + (
                jnp.sum(w[..., None] * rel_anchor, axis=1) / denom[:, None]
            )
        else:
            center = jnp.sum(w[..., None] * pos, axis=1) / denom[:, None]
    if bulk is None:
        bulk = jnp.sum(w[..., None] * vel, axis=1) / denom[:, None]

    rel = pos - center[:, None, :]
    if box_size is not None:
        rel = periodic_displacement(rel, box_size)
    rel = rel * valid[..., None].astype(pos.dtype)
    vrel = vel - bulk[:, None, :]
    r2 = jnp.sum(rel * rel, axis=-1)
    radius = jnp.sqrt(r2)
    inv_r = jnp.where(radius > 0, 1.0 / jnp.maximum(radius, 1e-30), 0.0)
    rhat = rel * inv_r[..., None]
    vrad = jnp.sum(vrel * rhat, axis=-1) * valid.astype(pos.dtype)
    return rhat, vrad, radius, center, bulk


def detect_apsides_static(
    track: TrackState,
    state: NBodyState,
    members: jnp.ndarray,   # [H, P] particle indices, -1 = padding
    mode: str = "pericentric",
    box_size=None,
    angle_cut: float = 0.0,
    center=None,            # [H, 3] fixed centers (None = mass-weighted)
    bulk_vel=None,          # [H, 3] fixed bulk velocities
    identity=False,         # members == arange(n): gather-free frames
):
    """Slot-aligned apsis update (no ID join needed: membership static).

    Semantics match the general engine (sign flip ``track_orbits.py:311-314``,
    angle accumulate/reset ``:330-351``, on-device angle_cut as in
    collation ``postprocessing.py:121-128``).
    """
    valid = members >= 0
    rhat, vrad, radius, center, bulk = _halo_frames(
        state, members, valid, box_size, center=center, bulk=bulk_vel,
        identity=identity,
    )
    new_track, apsis = _apsis_update(
        track, rhat, vrad, valid, mode, angle_cut
    )
    return new_track, (apsis, radius, center, bulk)


def _apsis_update(track, rhat, vrad, valid, mode, angle_cut):
    """Mode-specific half of the static detector: sign flip + angle
    accumulate/reset against freshly computed region frames.  Split out
    so mode='both' computes the (expensive, mode-independent) frames
    once and runs this twice."""
    cosang = jnp.clip(jnp.sum(track.rhat * rhat, axis=-1), -1.0, 1.0)
    dtheta = jnp.where(valid, jnp.arccos(cosang), 0.0)
    if mode == "pericentric":
        flip = (track.vrad < 0) & (vrad > 0)
    else:
        flip = (track.vrad > 0) & (vrad < 0)
    primed = track.primed
    apsis = valid & flip & primed

    angle_acc = track.angles + jnp.where(primed, dtheta, 0.0)
    hit = apsis & (angle_acc > angle_cut)
    counts = track.counts + hit.astype(track.counts.dtype)
    angles = jnp.where(apsis, 0.0, angle_acc)

    new_track = TrackState(
        rhat=rhat,
        vrad=vrad,
        angles=angles,
        counts=counts,
        primed=jnp.asarray(True),
    )
    return new_track, apsis


# ----------------------------------------------------------------------
# the fused simulate+track scan
# ----------------------------------------------------------------------

def _hashable_num(v):
    """Array-valued scalars -> Python floats (vectors -> tuples) so the
    config can serve as a hashable static jit argument."""
    if v is None or isinstance(v, (int, float)):
        return v
    a = np.asarray(v)
    return float(a) if a.ndim == 0 else tuple(float(x) for x in a)


def simulate_with_tracking(
    state: NBodyState,
    members: jnp.ndarray,
    config: OrbitNBodyConfig,
    force_fn: Callable = direct_forces,
    track: Optional[TrackState] = None,
    step_offset: int = 0,
    identity: Optional[bool] = None,
):
    """Run ``n_steps`` of KDK with apsis detection every ``detect_every``
    steps — one jit'd ``lax.scan``, zero host round-trips.

    Returns ``(final NBodyState, final TrackState, aux)`` where ``aux``
    holds per-detection total event counts (``[n_detections]``) for
    monitoring.  Per-particle counts live in ``TrackState.counts``.

    ``mode='both'`` tracks pericenters AND apocenters in one run: the
    (expensive, mode-independent) region frames are computed once per
    detection and both accumulators update from them — the returned
    track is a ``(peri, apo)`` tuple of :class:`TrackState` and the
    per-step event counts have shape ``[n_steps, 2]``.

    ``track``/``step_offset`` resume a previous run mid-stream (see
    :func:`run_tracked_simulation` for the checkpointing wrapper):
    ``step_offset`` keeps the detection cadence phase-correct across
    chunks.
    """
    if config.mode not in ("pericentric", "apocentric", "both"):
        raise ValueError(
            "Orbit detection mode not recognized. Please specify either "
            "'pericentric' or 'apocentric'."
        )
    if track is not None:
        n_tr = 1 if isinstance(track, TrackState) else len(track)
        n_expect = 2 if config.mode == "both" else 1
        if n_tr != n_expect:
            raise ValueError(
                f"mode={config.mode!r} expects "
                f"{'a (peri, apo) pair' if n_expect == 2 else 'a single'}"
                f" TrackState to resume from, got {n_tr}"
            )
    cfg_static = config._replace(
        centers=None,
        bulk_vels=None,
        # the static-arg cache hashes the config: array-valued numeric
        # fields (e.g. box_size off a loader/device) must become plain
        # Python numbers (scalars) or tuples (vector box) first
        dt=_hashable_num(config.dt),
        softening=_hashable_num(config.softening),
        G=_hashable_num(config.G),
        angle_cut=_hashable_num(config.angle_cut),
        box_size=_hashable_num(config.box_size),
        n_steps=int(config.n_steps),
        detect_every=int(config.detect_every),
    )
    # members == arange(n) (every particle tracked, in order) lets the
    # detector skip its member gathers entirely.  identity=None
    # auto-detects — exactly, but only when ``members`` is a host
    # array (checking a device array would fetch it every call);
    # pass identity=True explicitly for device-resident members.
    if identity is None:
        h, p = members.shape
        identity = bool(
            isinstance(members, np.ndarray)
            and h * p == state.pos.shape[0]
            and np.array_equal(
                members.ravel(), np.arange(h * p, dtype=members.dtype)
            )
        )
    return _tracked_run(
        state, members, track, config.centers, config.bulk_vels,
        jnp.int32(step_offset), force_fn, cfg_static, bool(identity),
    )


@functools.partial(
    jax.jit, static_argnames=("force_fn", "cfg", "identity")
)
def _tracked_run(state, members, track, centers, bulk_vels, step_offset,
                 force_fn, cfg, identity=False):
    """The whole run — initial force, detector seeding, scan — under ONE
    module-level jit.  Two measured reasons:

    - dispatched eagerly, the prologue alone costs tens of seconds of
      op-by-op round trips at 12.6M particles, and XLA schedules the
      fused graph with far less memory than the eager ops;
    - a per-call ``jax.jit`` wrapper re-traces and re-loads the
      executable every call (roughly doubling a 32-step benchmark run),
      while this cache is keyed on ``(force_fn, cfg, shapes)`` so
      repeat calls — including :func:`run_tracked_simulation`'s
      checkpoint chunks, whose only delta is the traced ``step_offset``
      — reuse the compiled executable.
    """
    n_halos, capacity = members.shape
    both = cfg.mode == "both"
    modes = ("pericentric", "apocentric") if both else (cfg.mode,)

    def detect(trs, st):
        # region frames are mode-independent: compute once, update every
        # accumulator from them (mode='both' costs ~one extra elementwise
        # pass, not a second frame computation)
        valid = members >= 0
        rhat, vrad, _radius, _c, _b = _halo_frames(
            st, members, valid, cfg.box_size,
            center=centers, bulk=bulk_vels, identity=identity,
        )
        outs, evs = [], []
        for m, tr in zip(modes, trs):
            tr2, apsis = _apsis_update(
                tr, rhat, vrad, valid, m, cfg.angle_cut
            )
            outs.append(tr2)
            evs.append(jnp.sum(apsis, dtype=jnp.int32))
        return tuple(outs), jnp.stack(evs)

    acc0 = force_fn(
        state.pos, state.mass, softening=cfg.softening, G=cfg.G,
        box_size=cfg.box_size,
    )
    if track is None:
        trs0 = tuple(
            init_track_state(n_halos, capacity, dtype=state.pos.dtype)
            for _ in modes
        )
        # seed the detector from the initial conditions so the first
        # detection interval can already catch a sign flip
        trs0, _ = detect(trs0, state)
    else:
        # NB: TrackState is itself a (named) tuple — test the type, not
        # tuple-ness, to tell one resumed track from a (peri, apo) pair
        trs0 = (track,) if isinstance(track, TrackState) else tuple(track)

    def body(carry, step_idx):
        st, trs, acc = carry
        st, acc = kdk_step(
            st, acc, cfg.dt, force_fn,
            box_size=cfg.box_size,
            softening=cfg.softening, G=cfg.G,
        )
        do_detect = (step_idx + 1) % cfg.detect_every == 0

        trs, n_events = jax.lax.cond(
            do_detect,
            lambda trs: detect(trs, st),
            lambda trs: (trs, jnp.zeros(len(modes), jnp.int32)),
            trs,
        )
        return (st, trs, acc), n_events

    (state_f, trs_f, _), events_per_step = jax.lax.scan(
        body, (state, trs0, acc0),
        step_offset + jnp.arange(cfg.n_steps),
    )
    if both:
        return state_f, trs_f, events_per_step          # [n_steps, 2]
    return state_f, trs_f[0], events_per_step[:, 0]


def run_tracked_simulation(
    state: NBodyState,
    members: jnp.ndarray,
    config: OrbitNBodyConfig,
    force_fn: Callable = direct_forces,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: Optional[int] = None,
    resume: bool = False,
):
    """Chunked driver around :func:`simulate_with_tracking` with durable
    checkpointing — the integrator analogue of the offline tracker's
    checkpoint/resume (reference semantics at ``track_orbits.py:93-101``).

    The run is split into chunks of ``checkpoint_every`` steps; after
    each chunk the full resumable state (particles, detector, step
    counter, accumulated per-detection event counts) is written to
    ``checkpoint_dir`` with orbax.  ``resume=True`` continues from the
    latest saved step.
    """
    import numpy as _np

    if checkpoint_dir is None or checkpoint_every is None:
        return simulate_with_tracking(state, members, config, force_fn)

    import os

    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))

    step_done = 0
    track = None
    events_acc = []
    if resume:
        latest = mngr.latest_step()
        if latest is not None:
            n_halos, capacity = members.shape
            both = config.mode == "both"

            def _tr():
                return init_track_state(
                    n_halos, capacity, dtype=state.pos.dtype
                )._replace(primed=jnp.asarray(True))

            template = {
                "state": state,
                "track": (_tr(), _tr()) if both else _tr(),
                "events": jnp.zeros(
                    (latest, 2) if both else (latest,), jnp.int32
                ),
            }
            restored = mngr.restore(
                latest, args=ocp.args.StandardRestore(template)
            )
            state = restored["state"]
            track = restored["track"]
            events_acc = [_np.asarray(restored["events"])]
            step_done = latest

    while step_done < config.n_steps:
        n = min(checkpoint_every, config.n_steps - step_done)
        chunk_cfg = config._replace(n_steps=n)
        state, track, ev = simulate_with_tracking(
            state, members, chunk_cfg, force_fn,
            track=track, step_offset=step_done,
        )
        events_acc.append(_np.asarray(ev))
        step_done += n
        mngr.save(
            step_done,
            args=ocp.args.StandardSave({
                "state": state,
                "track": track,
                "events": jnp.asarray(_np.concatenate(events_acc)),
            }),
        )
    mngr.wait_until_finished()
    return state, track, jnp.asarray(_np.concatenate(events_acc))


def total_energy(state: NBodyState, softening=0.05, G=1.0, box_size=None):
    """Kinetic + pairwise potential energy (integrator validation)."""
    ke = 0.5 * jnp.sum(state.mass * jnp.sum(state.vel**2, axis=-1))
    dx = state.pos[None, :, :] - state.pos[:, None, :]
    if box_size is not None:
        dx = periodic_displacement(dx, box_size)
    d2 = jnp.sum(dx * dx, axis=-1) + softening * softening
    inv_d = jax.lax.rsqrt(d2)
    mm = state.mass[:, None] * state.mass[None, :]
    off = 1.0 - jnp.eye(state.pos.shape[0], dtype=state.pos.dtype)
    pe = -0.5 * G * jnp.sum(mm * inv_d * off)
    return ke + pe
