"""Fused Pallas TPU kernel for the VRP delta (incremental) scorer.

The XLA shift-merge path (`cotwin_builder._delta_parts_small`) lowers each
per-neighbour [A, R] grid construct to a separate HBM-round-tripping op;
profiled at the flagship geometry the neighbourhood score is ~60% of the
TabuSearch step. This kernel fuses the entire grid pipeline — base-route
materialization, stay-row patching, shift computation, the 2KD+1-roll
merge, insertion, the lateness prefix scan, chain-leg accumulation and
dirty-pair extraction — into one Pallas program that keeps every
intermediate in VMEM/registers.

Layout: one sublane row per (neighbour, affected-route) pair, route slots on
lanes ([NB*A, Rp] tiles, Rp = route_cap rounded to 128). Base routes are
materialized with a ONE-HOT MATMUL on the MXU (onehot[NB*A, K] @
ctx_mat[K, 6*Rp]) instead of a gather — row selection is exactly the
matmul shape the MXU eats. All per-neighbour scalar analysis (the
`_delta_common` contract, closed-form shift-at-row, insert ranks) stays in
XLA where it is [P, KD]-sized and cheap; the kernel returns per-route
metrics plus dirty-pair endpoints, and XLA finishes with the one
distance-matrix gather per neighbour (carried-leg corrections, reference
semantics `examples/vrp/src/score/incremental_score_calculator.rs:55-139`).

Bit-parity with the XLA path is enforced by tests/test_delta_pallas.py.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from greyjack_tpu.ops import moves, lexico

_BIG = 1 << 30

# --- VMEM-aware program sizing -------------------------------------------
# Round 2 shipped a hard-coded 128 neighbours/program and OOMed the 16MB
# scoped-VMEM stack by 104KB at the flagship geometry (BENCH_r02.json:
# "Scoped allocation with size 16.10M and limit 16.00M"). The footprint is
# dominated by [NB*2KD, Rp] i32 intermediates; calibrating against that
# measured point (NB=128, KD=2, Rp=128, tw -> 16.10M) gives ~61 such live
# tiles for the time-windowed kernel. We model scoped VMEM as
# UNITS * (NB*2KD) * Rp * 4B and pick the largest NB that stays under a
# conservative budget, leaving headroom for Mosaic's own scratch.
_VMEM_UNITS_TW = 88       # measured 61.4 + ~13 tall-stack tiles; margin
_VMEM_UNITS_NOTW = 60     # no ct/fl/ce merge keys, no lateness scan arrays
_VMEM_BUDGET = 12 * 1024 * 1024


def n_routes(kd):
    """Static route rows per neighbour: a kd<=2 delta touches at most 3
    distinct routes (change: old + new vehicle; swap: both rows' old
    vehicles plus — for the mixed vehicle/customer swap on the common
    group — the moved row's new vehicle), so the 2*kd av slots compact to
    min(3, 2*kd). 25% less grid work / VMEM / depot dm lookups at kd=2."""
    return min(3, 2 * kd)


def pick_nb(p, kd, rp, tw):
    """Largest neighbours-per-program dividing `p` whose estimated scoped
    VMEM fits the budget; None if even NB=8 does not fit (caller falls back
    to the XLA path). Env `GJ_PALLAS_NB` pins the value for sweeps."""
    env = os.environ.get("GJ_PALLAS_NB")
    if env:
        nb = int(env)
        return nb if p % nb == 0 else None
    units = _VMEM_UNITS_TW if tw else _VMEM_UNITS_NOTW
    for nb in (256, 128, 64, 32, 16, 8):
        if p % nb != 0:
            continue
        if units * (nb * n_routes(kd)) * rp * 4 <= _VMEM_BUDGET:
            return nb
    return None


def _roll_lanes(x, s, width, native):
    """Static circular right-shift along the lane axis. pltpu.roll on
    hardware (unaligned lane slice+concat triggers pathological Mosaic
    relayouts); slice+concat in the interpreter (pltpu.roll has no
    interpreter rule). `native` is a trace-time static passed down from
    pallas_call's interpret flag — NOT module state (round-2 weakness: a
    module global flipped at call time is invisible to jit cache keys)."""
    s = s % width
    if s == 0:
        return x
    if native:
        # shift must be i32: the x64-default i64 scalar fails tpu.dynamic_rotate
        return pltpu.roll(x, shift=jnp.int32(s), axis=1)
    return jnp.concatenate([x[:, width - s:], x[:, :width - s]], axis=1)


def _psum_lanes(x, lane, width, native):
    """Inclusive prefix sum along lanes (log-doubling; wrapped lanes are
    masked by the `lane >= step` guard). int32 literals throughout: weak
    Python ints trace as i64 under x64 and Mosaic cannot lower the cast."""
    step = 1
    while step < width:
        x = x + jnp.where(lane >= step, _roll_lanes(x, step, width, native),
                          jnp.int32(0))
        step *= 2
    return x


def _pmax_lanes(x, lane, width, neutral, native):
    step = 1
    while step < width:
        x = jnp.maximum(
            x, jnp.where(lane >= step, _roll_lanes(x, step, width, native),
                         jnp.int32(neutral)))
        step *= 2
    return x


def _extract(mask_lane, arr):
    return jnp.sum(jnp.where(mask_lane, arr, jnp.int32(0)), axis=1,
                   keepdims=True, dtype=jnp.int32)


def _kernel(ctx_ref, av_ref, sc_ref, ins_ref, pay_ref, el_ref,
            misc_ref, u_ref, v_ref, c_ref, *, kk, rp, kd, tw, native):
    nba = av_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nba, rp), 1)

    # --- base routes via one-hot matmul on the MXU -------------------------
    kio = jax.lax.broadcasted_iota(jnp.int32, (nba, kk), 1)
    # explicit selects instead of bool.astype — Mosaic's convert-element-
    # type helper recurses on bool casts
    onehot = jnp.where(av_ref[:] == kio,
                       jnp.float32(1), jnp.float32(0))
    # HIGHEST precision: the MXU's default f32 path rounds through bf16
    # passes on hardware (interpret mode is exact f32) — payloads are
    # < 2^24 ints, so full-precision passes make the select exact
    # (hardware-parity suite caught ~0.5% lateness drift without this)
    base = jnp.dot(onehot, ctx_ref[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    r_stop = base[:, 0:rp]
    r_c = base[:, rp:2 * rp]
    r_ct = base[:, 2 * rp:3 * rp]
    r_fl = base[:, 3 * rp:4 * rp]
    r_ce = base[:, 4 * rp:5 * rp]
    r_leg = base[:, 5 * rp:6 * rp]

    # --- patch stay rows' customer payloads in place -----------------------
    for k in range(kd):
        pm = lane == sc_ref[:, k:k + 1]
        r_c = jnp.where(pm, pay_ref[:, 4 * k:4 * k + 1], r_c)
        r_ct = jnp.where(pm, pay_ref[:, 4 * k + 1:4 * k + 2], r_ct)
        r_fl = jnp.where(pm, pay_ref[:, 4 * k + 2:4 * k + 3], r_fl)
        r_ce = jnp.where(pm, pay_ref[:, 4 * k + 3:4 * k + 4], r_ce)

    # --- shifts -------------------------------------------------------------
    # at most KD slots are cleared, so "cleared slots strictly before lane"
    # is KD compares — no [rp]-wide prefix scan (saves log2(rp) rolls)
    cleared = jnp.zeros((nba, rp), bool)
    rem_before = jnp.zeros((nba, rp), jnp.int32)
    for k in range(kd):
        cp = sc_ref[:, kd + k:kd + k + 1]
        cleared = cleared | (lane == cp)
        rem_before = rem_before + jnp.where((cp >= 0) & (cp < lane),
                                            jnp.int32(1), jnp.int32(0))
    ins_before = jnp.zeros((nba, rp), jnp.int32)
    iflag = []
    for k in range(kd):
        fl = ins_ref[:, k:k + 1] > 0
        iflag.append(fl)
        ins_before = ins_before + jnp.where(
            fl & (ins_ref[:, kd + k:kd + k + 1] < r_stop),
            jnp.int32(1), jnp.int32(0))
    shift = ins_before - rem_before
    survives = ~cleared

    # --- merge: 2*KD+1 masked rolls, all keys stacked on sublanes ----------
    # one tall [nk*nba, rp] roll per shift instead of one roll per
    # (shift, key): 5 rolls total, not 25 — roll/where op issue dominates
    # the grid at these tile sizes
    keys = [r_c, r_leg] + ([r_ct, r_fl, r_ce] if tw else [])
    nk = len(keys)
    lane_tall = jax.lax.broadcasted_iota(jnp.int32, (nk * nba, rp), 1)
    acc_tall = jnp.zeros((nk * nba, rp), jnp.int32)
    for s in range(-kd, kd + 1):
        m = survives & (shift == s)
        keep = (lane_tall >= s) if s >= 0 else (lane_tall < rp + s)
        masked_tall = jnp.concatenate(
            [jnp.where(m, key, jnp.int32(0)) for key in keys], axis=0)
        acc_tall = acc_tall + jnp.where(
            keep, _roll_lanes(masked_tall, s, rp, native), jnp.int32(0))
    merged = [acc_tall[i * nba:(i + 1) * nba] for i in range(nk)]

    # --- inserts -------------------------------------------------------------
    ins_pos = []
    for k in range(kd):
        rank_base = jnp.sum(
            jnp.where(iflag[k] & survives
                      & (ins_ref[:, kd + k:kd + k + 1] >= r_stop),
                      jnp.int32(1), jnp.int32(0)),
            axis=1, keepdims=True, dtype=jnp.int32)
        ip = rank_base + ins_ref[:, 2 * kd + k:2 * kd + k + 1]
        ins_pos.append(ip)
        im = iflag[k] & (lane == ip)
        ins_vals = [pay_ref[:, 4 * k:4 * k + 1],            # c
                    jnp.zeros((nba, 1), jnp.int32)]         # leg
        if tw:
            ins_vals += [pay_ref[:, 4 * k + 1:4 * k + 2],   # ct
                         pay_ref[:, 4 * k + 2:4 * k + 3],   # floor
                         pay_ref[:, 4 * k + 3:4 * k + 4]]   # ce
        for i in range(len(keys)):
            merged[i] = jnp.where(im, ins_vals[i], merged[i])
    m_c, m_leg = merged[0], merged[1]

    length = sc_ref[:, 2 * kd + 2:2 * kd + 3]
    vj = lane < length
    has = length > 0

    # --- lateness prefix (integer, bit-identical to the sequential walk) ----
    if tw:
        m_ct, m_fl, m_ce = merged[2], merged[3], merged[4]
        ct = jnp.where(vj, m_ct, jnp.int32(0))
        fl = jnp.where(vj, m_fl, jnp.int32(-_BIG))
        p = _psum_lanes(ct, lane, rp, native)
        cm = _pmax_lanes(fl - p, lane, rp, -_BIG, native)
        w0 = sc_ref[:, 2 * kd:2 * kd + 1]
        w1 = sc_ref[:, 2 * kd + 1:2 * kd + 2]
        post = p + jnp.maximum(w0, cm)
        late = jnp.where(vj, jnp.maximum(post - m_ce, jnp.int32(0)),
                         jnp.int32(0))
        late_sum = jnp.sum(late, axis=1, keepdims=True, dtype=jnp.int32)
        overtime = jnp.where(
            has, jnp.maximum(post[:, rp - 1:rp] - w1, jnp.int32(0)),
            jnp.int32(0))
        late_total = late_sum + overtime
    else:
        late_total = jnp.zeros((nba, 1), jnp.int32)

    # --- chain legs + endpoints ----------------------------------------------
    vpair = vj & (lane + 1 < length)
    chain = jnp.sum(jnp.where(vpair, m_leg, jnp.int32(0)), axis=1,
                    keepdims=True, dtype=jnp.int32)
    first_c = m_c[:, 0:1]
    last_c = _extract(lane == length - 1, m_c)

    # --- dirty-pair extraction -------------------------------------------------
    # physical slots: [E1_k (locus-1), E2_k (locus, stay)] from XLA el;
    # [E3_k (ins_pos-1), E4_k (ins_pos)] from in-kernel insert positions.
    # All 4*kd slots stacked on sublanes: 3 tall masked reductions instead
    # of 12x3 per-slot extracts (elr == -1 disables a slot: `lane == elr`
    # never matches, and the +1 variant is guarded so lane 0 doesn't match)
    slot_cols = (
        [el_ref[:, k:k + 1] for k in range(kd)]               # E1
        + [el_ref[:, kd + k:kd + k + 1] for k in range(kd)]   # E2
        + [jnp.where(iflag[k], ins_pos[k] - 1, jnp.int32(-1))
           for k in range(kd)]                                # E3
        + [jnp.where(iflag[k], ins_pos[k], jnp.int32(-1))
           for k in range(kd)])                               # E4
    ne = 4 * kd
    # per-slot [nba, rp] masks are built BEFORE the sublane concat: Mosaic
    # cannot concatenate 1-wide column slices whose lane offsets differ
    # ("result/input offset mismatch on non-concat dimension"; caught by
    # tests/test_delta_pallas_tpu.py — interpret mode accepts it)
    mc_tall = jnp.concatenate([m_c] * ne, axis=0)
    mleg_tall = jnp.concatenate([m_leg] * ne, axis=0)
    m_at = jnp.concatenate([lane == col for col in slot_cols], axis=0)
    m_rt = jnp.concatenate(
        [(lane == col + 1) & (col >= 0) for col in slot_cols], axis=0)
    us_t = jnp.sum(jnp.where(m_at, mc_tall, jnp.int32(0)), axis=1,
                   keepdims=True, dtype=jnp.int32)
    vs_t = jnp.sum(jnp.where(m_rt, mc_tall, jnp.int32(0)), axis=1,
                   keepdims=True, dtype=jnp.int32)
    cs_t = jnp.sum(jnp.where(m_at, mleg_tall, jnp.int32(0)), axis=1,
                   keepdims=True, dtype=jnp.int32)

    pad = [jnp.zeros((nba, 1), jnp.int32)] * (8 - 4 * kd)
    u_ref[:] = jnp.concatenate(
        [us_t[e * nba:(e + 1) * nba] for e in range(ne)] + pad, axis=1)
    v_ref[:] = jnp.concatenate(
        [vs_t[e * nba:(e + 1) * nba] for e in range(ne)] + pad, axis=1)
    c_ref[:] = jnp.concatenate(
        [cs_t[e * nba:(e + 1) * nba] for e in range(ne)] + pad, axis=1)
    ip_out = [jnp.where(iflag[k], ins_pos[k], jnp.int32(-1))
              for k in range(kd)]
    ip_pad = [jnp.zeros((nba, 1), jnp.int32)] * (2 - kd)
    misc_ref[:] = jnp.concatenate(
        [late_total, chain, first_c, last_c] + ip_out + ip_pad
        + [jnp.zeros((nba, 1), jnp.int32)] * 2, axis=1)


def _interpret():
    return jax.default_backend() != "tpu"


def eligible(utils, deltas):
    """Static eligibility of the fused kernel for this (instance, move set):
    narrow deltas, i32 accumulation bounds, f32-exact fact magnitudes,
    lane-friendly route cap, and a batch big enough to fill programs."""
    if os.environ.get("GJ_NO_PALLAS"):
        return False
    if _interpret() and not os.environ.get("GJ_PALLAS_INTERPRET"):
        # off-TPU the kernel would run interpreted (orders of magnitude
        # slower than the XLA path); only parity tests opt in
        return False
    kd = deltas["positions"].shape[-1]
    p = deltas["positions"].shape[0]
    if kd > 2:
        return False
    if utils["acc_dtype"] != jnp.int32:
        return False
    if utils["route_cap"] > 512:
        return False
    rp = -(-utils["route_cap"] // 128) * 128
    if pick_nb(p, kd, rp, bool(utils["time_windowed"])) is None:
        return False
    # one-hot matmul exactness: every ctx payload must be f32-exact
    bound = max(utils["n_stops"], utils["n_locations"],
                utils.get("dm_max_milli", 1 << 30),
                utils.get("t_max", 0))
    return bound < (1 << 24)


def score_delta_batch(ctx, deltas, utils):
    """Batched drop-in for vmap(score_delta): f64[P, S] or None if the
    kernel is statically ineligible (caller falls back to the XLA path).

    Staged as _pre (XLA analysis + input packing) -> pallas_call -> _post
    (dm gather + score assembly) so each stage is independently timeable
    (scripts/profile_delta.py) and tunable."""
    if not eligible(utils, deltas):
        return None
    inputs, aux = _pre(ctx, deltas, utils)
    outs = _call_kernel(inputs, utils, aux["kd"])
    return _post(outs, aux, ctx, utils)


def score_delta_batch_ints(ctx, deltas, utils):
    """Integer-delta variant for the local-search hot loop: i32[P, 3] rows
    (1000*d_dups + d_overflow, d_late, d_dist_milli), lexicographically
    order-equivalent to the f64 score rows (each f64 component is
    base + delta under a monotonic map, and base sums are exact in f64).
    Stub (over-cap / poisoned-base) neighbours become INT32_MAX rows, which
    can never win an accept-if-<=-zero comparison. Keeps f64 out of the
    per-step argmin/accept entirely — f64 is software-emulated on v5e.
    None if the fused kernel is ineligible."""
    if not eligible(utils, deltas):
        return None
    inputs, aux = _pre(ctx, deltas, utils)
    outs = _call_kernel(inputs, utils, aux["kd"])
    return _post(outs, aux, ctx, utils, as_ints=True)


def _compact_routes(c, kd, k):
    """Compact the 2*kd av route slots to `n_routes(kd)` (see n_routes):
    slot j holds the j-th distinct affected vehicle (arep order), sentinel
    k otherwise; a_of_* remapped by vehicle-id match (av values are unique
    per neighbour after the arep dedupe)."""
    nr = n_routes(kd)
    if nr >= 2 * kd:
        return c
    av4, arep4 = c["av"], c["arep"]
    rank = jnp.cumsum(arep4.astype(jnp.int32), axis=1) - arep4
    m = arep4[:, :, None] & (rank[:, :, None]
                             == jnp.arange(nr)[None, None, :])
    av3 = (jnp.sum(jnp.where(m, av4[:, :, None], 0), axis=1,
                   dtype=jnp.int32)
           + jnp.where(jnp.any(m, axis=1), 0, k).astype(jnp.int32))
    a_of_row = jnp.argmax(av3[:, None, :] == c["old_v"][:, :, None],
                          axis=2).astype(jnp.int32)
    a_of_new = jnp.argmax(av3[:, None, :] == c["new_v"][:, :, None],
                          axis=2).astype(jnp.int32)
    # invariant guard: the nr=3 compaction assumes a kd<=2 delta touches at
    # most 3 distinct vehicles (holds for every config eligible() admits
    # today). A future move type violating it would silently drop the 4th
    # route and mis-score — poison such neighbours with the stub instead
    # (`compact_bad` folds into over_cap in _pre; ADVICE r3)
    compact_bad = jnp.sum(arep4.astype(jnp.int32), axis=1) > nr
    return {**c, "av": av3, "arep": av3 < k,
            "av_safe": jnp.minimum(av3, k - 1),
            "a_of_row": a_of_row, "a_of_new": a_of_new,
            "compact_bad": compact_bad}


def _pre(ctx, deltas, utils):
    """XLA stage 1: per-neighbour scalar analysis (`_delta_common`) and the
    packed per-(neighbour, route) kernel input columns."""
    kd = deltas["positions"].shape[-1]
    p = deltas["positions"].shape[0]
    a2 = n_routes(kd)
    r = utils["route_cap"]
    rp = -(-r // 128) * 128
    n = ctx["v"].shape[0]
    tw = bool(utils["time_windowed"])

    from greyjack_tpu.models.vrp.cotwin_builder import _delta_common

    c = jax.vmap(lambda d: _delta_common(ctx, moves.dedupe_delta(d), utils))(
        deltas)
    c = _compact_routes(c, kd, utils["k_vehicles"])
    rows = c["rows"]              # [P, KD]
    rep = c["rep"]
    old_v, old_c = c["old_v"], c["old_c"]
    new_v, new_c = c["new_v"], c["new_c"]
    veh_changed, stay = c["veh_changed"], c["stay"]
    av, arep, av_safe = c["av"], c["arep"], c["av_safe"]
    a_of_row, a_of_new = c["a_of_row"], c["a_of_new"]
    slot = c["slot_of_row"]

    # closed-form shift at each rep row's own cell (equals the grid
    # ins_before - rem_before at (a_of_row, slot_of_row); base r_stop at the
    # row's own slot IS the row id, so key_gt collapses to rows[k'] < rows[k])
    ins_at = jnp.sum(veh_changed[:, None, :]
                     & (new_v[:, None, :] == old_v[:, :, None])
                     & (rows[:, None, :] < rows[:, :, None]),
                     axis=2, dtype=jnp.int32)
    rem_at = jnp.sum(veh_changed[:, None, :]
                     & (old_v[:, None, :] == old_v[:, :, None])
                     & (slot[:, None, :] < slot[:, :, None]),
                     axis=2, dtype=jnp.int32)
    locus = slot + ins_at - rem_at

    # insert ranks among same-route inserts (by stop-id order)
    ins_key = jnp.where(veh_changed, rows, n)
    same_new = (veh_changed[:, :, None] & veh_changed[:, None, :]
                & (a_of_new[:, :, None] == a_of_new[:, None, :]))
    ins_rank_ins = jnp.sum(same_new & (ins_key[:, None, :]
                                       < ins_key[:, :, None]),
                           axis=2, dtype=jnp.int32)

    # ONE packed per-vehicle gather (wds, wde, len, dist, late, load, cap,
    # depot) replaces 8 separate table gathers across pre+post
    vp = ctx["veh_pack"][av_safe]                          # [P, A, 8] i32

    # per-(neighbour, route) lengths (XLA: O(KD*A))
    ai = jnp.arange(a2, dtype=jnp.int32)
    n_clr = jnp.sum(veh_changed[:, None, :]
                    & (a_of_row[:, None, :] == ai[None, :, None]),
                    axis=2, dtype=jnp.int32)
    n_ins = jnp.sum(veh_changed[:, None, :]
                    & (a_of_new[:, None, :] == ai[None, :, None]),
                    axis=2, dtype=jnp.int32)
    length = vp[..., 2] - n_clr + n_ins                    # [P, A]
    over_cap = jnp.any(arep & (length > r), axis=1)
    if "compact_bad" in c:
        over_cap = over_cap | c["compact_bad"]

    # --- kernel inputs: per-(neighbour, route) scalar columns [P, A] ---------
    def per_k_row(flag_k, val_k, a_k):
        m = flag_k[:, None] & (a_k[:, None] == ai[None, :])
        return jnp.where(m, val_k[:, None], -1)

    pslot = [per_k_row(stay[:, k], slot[:, k], a_of_row[:, k])
             for k in range(kd)]
    cslot = [per_k_row(veh_changed[:, k], slot[:, k], a_of_row[:, k])
             for k in range(kd)]
    iflag = [(veh_changed[:, k, None]
              & (a_of_new[:, k, None] == ai[None, :])).astype(jnp.int32)
             for k in range(kd)]
    irow = [jnp.broadcast_to(rows[:, k, None], (p, a2)) for k in range(kd)]
    irank = [jnp.broadcast_to(ins_rank_ins[:, k, None], (p, a2))
             for k in range(kd)]
    if tw:
        w0row = vp[..., 0]
        w1row = vp[..., 1]
    else:
        w0row = jnp.zeros((p, a2), jnp.int32)
        w1row = jnp.zeros((p, a2), jnp.int32)

    zero_pa = jnp.zeros((p, a2), jnp.int32)
    sc_cols = pslot + cslot + [w0row, w1row, length]
    sc_cols += [zero_pa] * (8 - len(sc_cols))
    sc_pack = jnp.stack(sc_cols, axis=-1).reshape(p * a2, 8)

    ins_cols = iflag + irow + irank
    ins_cols += [zero_pa] * (8 - len(ins_cols))
    ins_pack = jnp.stack(ins_cols, axis=-1).reshape(p * a2, 8)

    crows = utils["cust_packed"][new_c]                    # [P, KD, 4]
    cid, ct_p = new_c, crows[..., 3]
    fl_p = crows[..., 1] + crows[..., 3]
    ce_p = crows[..., 2]
    dem_new = crows[..., 0]
    pay_cols = []
    for k in range(kd):
        pay_cols += [cid[:, k], ct_p[:, k], fl_p[:, k], ce_p[:, k]]
    pay_cols += [jnp.zeros((p,), jnp.int32)] * (8 - len(pay_cols))
    pay_pack = jnp.broadcast_to(
        jnp.stack(pay_cols, axis=-1).astype(jnp.int32)[:, None, :],
        (p, a2, 8)).reshape(p * a2, 8)

    # E1/E2 extraction lanes (XLA-known): on a_of_row rows
    e1 = [per_k_row(rep[:, k], locus[:, k] - 1, a_of_row[:, k])
          for k in range(kd)]
    e2 = [per_k_row(stay[:, k], locus[:, k], a_of_row[:, k])
          for k in range(kd)]
    el_cols = e1 + e2 + [zero_pa - 1] * (8 - 2 * kd)
    el_pack = jnp.stack(el_cols, axis=-1).reshape(p * a2, 8)

    av_col = av_safe.reshape(p * a2, 1).astype(jnp.int32)

    pad = rp - r
    ctx_mat = jnp.concatenate([
        jnp.pad(ctx["r_stop"], ((0, 0), (0, pad)), constant_values=n),
        jnp.pad(ctx["r_c"], ((0, 0), (0, pad))),
        jnp.pad(ctx["r_ct"], ((0, 0), (0, pad))),
        jnp.pad(ctx["r_floor"], ((0, 0), (0, pad))),
        jnp.pad(ctx["r_ce"], ((0, 0), (0, pad))),
        jnp.pad(ctx["r_leg"], ((0, 0), (0, pad))),
    ], axis=1)                                             # [K, 6*Rp]

    inputs = (ctx_mat, av_col, sc_pack, ins_pack, pay_pack, el_pack)
    aux = {"kd": kd, "c": c, "locus": locus, "length": length,
           "over_cap": over_cap, "vp": vp, "dem_new": dem_new}
    return inputs, aux


def _call_kernel(inputs, utils, kd):
    """Stage 2: the fused Mosaic kernel (grid over neighbour blocks)."""
    ctx_mat, av_col, sc_pack, ins_pack, pay_pack, el_pack = inputs
    a2 = n_routes(kd)
    p = av_col.shape[0] // a2
    kveh = utils["k_vehicles"]
    rp = ctx_mat.shape[1] // 6
    tw = bool(utils["time_windowed"])

    nb = pick_nb(p, kd, rp, tw)
    nba = nb * a2
    grid = p // nb
    kern = functools.partial(_kernel, kk=kveh, rp=rp, kd=kd, tw=tw,
                             native=not _interpret())
    # index maps must return i32 np scalars (literals): under jax_enable_x64
    # a Python 0 traces as i64 and Mosaic fails to legalize the transform
    # func.return; jnp constants are rejected as captured consts
    zero = np.int32(0)
    row_spec = lambda c_: pl.BlockSpec((nba, c_), lambda i: (i, zero),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((kveh, 6 * rp), lambda i: (zero, zero),
                         memory_space=pltpu.VMEM),
            row_spec(1), row_spec(8), row_spec(8), row_spec(8), row_spec(8),
        ],
        out_specs=[row_spec(8), row_spec(8), row_spec(8), row_spec(8)],
        out_shape=[jax.ShapeDtypeStruct((p * a2, 8), jnp.int32)] * 4,
        interpret=_interpret(),
    )(ctx_mat, av_col, sc_pack, ins_pack, pay_pack, el_pack)


def _post(outs, aux, ctx, utils, as_ints=False):
    """Stage 3: e-slot reassembly, the one consolidated distance-matrix
    gather, loads, and lexicographic score assembly (f64 rows, or i32
    delta rows when `as_ints` — see score_delta_batch_ints)."""
    misc, u_pk, v_pk, c_pk = outs
    kd = aux["kd"]
    c = aux["c"]
    locus = aux["locus"]
    length = aux["length"]
    over_cap = aux["over_cap"]
    vp = aux["vp"]
    a2 = n_routes(kd)
    p = length.shape[0]
    r = utils["route_cap"]
    l = utils["n_locations"]
    dmf = utils["dm_flat_milli"]
    ai = jnp.arange(a2, dtype=jnp.int32)

    rep = c["rep"]
    old_v, old_c = c["old_v"], c["old_c"]
    new_v, new_c = c["new_v"], c["new_c"]
    veh_changed = c["veh_changed"]
    av, arep, av_safe = c["av"], c["arep"], c["av_safe"]
    a_of_row, a_of_new = c["a_of_row"], c["a_of_new"]

    misc = misc.reshape(p, a2, 8)  # a2 = n_routes(kd) route rows
    late = misc[:, :, 0]                                    # [P, A] i32
    chain_raw = misc[:, :, 1]
    first_c = misc[:, :, 2]
    last_c = misc[:, :, 3]
    ins_pos = jnp.max(misc[:, :, 4:4 + kd], axis=1)         # [P, KD] (-1 none)

    def collapse(x):                                        # [P*A2, 8] -> [P, 8]
        return jnp.sum(x.reshape(p, a2, 8), axis=1, dtype=jnp.int32)

    u_all = collapse(u_pk)
    v_all = collapse(v_pk)
    carr_all = collapse(c_pk)

    # --- reassemble the e-slot order of the XLA path -------------------------
    # e in [0,KD): (a_of_row, locus-1); [KD,2KD): stay?(a_of_row,locus)
    # : (a_of_new, ins_pos-1); [2KD,3KD): (a_of_new, ins_pos), ev=veh_changed
    er = jnp.concatenate([a_of_row,
                          jnp.where(veh_changed, a_of_new, a_of_row),
                          a_of_new], axis=1)                # [P, 3KD]
    el = jnp.concatenate([locus - 1,
                          jnp.where(veh_changed, ins_pos - 1, locus),
                          ins_pos], axis=1)
    ev = jnp.concatenate([rep, rep, veh_changed], axis=1)
    len_at = jnp.take_along_axis(length, jnp.minimum(er, a2 - 1), axis=1)
    ev = ev & (el >= 0) & (el <= len_at - 2)
    ekey = jnp.where(ev, er * (r + 1) + el, -1)
    ii3 = jnp.arange(3 * kd)
    edup = jnp.any((ekey[:, :, None] == ekey[:, None, :]) & ev[:, :, None]
                   & ev[:, None, :] & (ii3[None, None, :]
                                       < ii3[None, :, None]), axis=2)
    ev = ev & ~edup

    mid_u = jnp.where(veh_changed, u_all[:, 2 * kd:3 * kd],
                      u_all[:, kd:2 * kd])
    mid_v = jnp.where(veh_changed, v_all[:, 2 * kd:3 * kd],
                      v_all[:, kd:2 * kd])
    mid_c = jnp.where(veh_changed, carr_all[:, 2 * kd:3 * kd],
                      carr_all[:, kd:2 * kd])
    u = jnp.concatenate([u_all[:, :kd], mid_u, u_all[:, 3 * kd:4 * kd]],
                        axis=1)
    v_right = jnp.concatenate([v_all[:, :kd], mid_v,
                               v_all[:, 3 * kd:4 * kd]], axis=1)
    carried = jnp.concatenate([carr_all[:, :kd], mid_c,
                               carr_all[:, 3 * kd:4 * kd]], axis=1)

    # --- the ONE consolidated dm gather + finishing sums ---------------------
    has = length > 0
    depots = vp[..., 7]
    gidx = jnp.concatenate([
        jnp.where(ev, u * l + v_right, 0),
        jnp.where(has, depots * l + first_c, 0),
        jnp.where(has, last_c * l + depots, 0),
    ], axis=1)
    gvals = dmf[gidx]
    leg_new = gvals[:, :3 * kd]
    start_leg = jnp.where(has, gvals[:, 3 * kd:3 * kd + a2], 0)
    end_leg = jnp.where(has, gvals[:, 3 * kd + a2:], 0)

    corr = jnp.where(ev, leg_new - carried, 0)               # [P, 3KD]
    corr_by_route = jnp.sum(
        jnp.where(er[:, :, None] == ai[None, None, :],
                  corr[:, :, None], 0), axis=1, dtype=jnp.int32)
    chain = chain_raw + corr_by_route
    dist = jnp.where(has, start_leg + end_leg + chain, 0)

    # loads (XLA arithmetic, as in the grid path); demands ride the packed
    # row/customer gathers done in _pre — no cust_packed gathers here
    dem_old = c["dem_old"]
    dem_new = aux["dem_new"]
    is_old = old_v[:, None, :] == av[:, :, None]             # [P, A, KD]
    is_new = new_v[:, None, :] == av[:, :, None]
    contrib = (
        jnp.where(veh_changed[:, None, :] & is_old, -dem_old[:, None, :], 0)
        + jnp.where(veh_changed[:, None, :] & is_new, dem_new[:, None, :], 0)
        + jnp.where(rep[:, None, :] & ~veh_changed[:, None, :] & is_old,
                    (dem_new - dem_old)[:, None, :], 0))
    load = vp[..., 5] + jnp.sum(contrib, axis=2).astype(jnp.int32)

    cap_a = vp[..., 6]
    m = arep
    bad = over_cap | ctx["base_over"]
    if as_ints:
        # all-i32 delta rows (acc_dtype==i32 is an eligibility requirement,
        # so every term is i32-bounded by construction)
        d_dist = jnp.sum(jnp.where(m, dist - vp[..., 3], 0), axis=1,
                         dtype=jnp.int32)
        d_late = jnp.sum(jnp.where(m, late - vp[..., 4], 0), axis=1,
                         dtype=jnp.int32)
        d_over = jnp.sum(jnp.where(
            m,
            jnp.maximum(load - cap_a, 0) - jnp.maximum(vp[..., 5] - cap_a, 0),
            0), axis=1, dtype=jnp.int32)
        d_hard = 1000 * (c["new_dups"] - ctx["dups"]) + d_over
        out = jnp.stack([d_hard, d_late, d_dist], axis=1)
        stub_i = jnp.iinfo(jnp.int32).max
        return jnp.where(bad[:, None], stub_i, out)

    d_dist = jnp.sum(jnp.where(m, dist - vp[..., 3], 0), axis=1,
                     dtype=jnp.int64)
    d_late = jnp.sum(jnp.where(m, late - vp[..., 4], 0), axis=1,
                     dtype=jnp.int64)
    d_over = jnp.sum(jnp.where(
        m,
        jnp.maximum(load - cap_a, 0).astype(jnp.int64)
        - jnp.maximum(vp[..., 5] - cap_a, 0).astype(jnp.int64),
        0), axis=1)

    hard = (1000.0 * c["new_dups"].astype(jnp.float64)
            + (ctx["sum_overflow"] + d_over).astype(jnp.float64))
    medium = (ctx["sum_late"] + d_late).astype(jnp.float64)
    soft = (ctx["sum_dist"] + d_dist).astype(jnp.float64) / 1000.0
    out = jnp.stack([hard, medium, soft], axis=1)
    stub = lexico.stub_score_row(3)
    return jnp.where(bad[:, None], stub[None, :], out)
