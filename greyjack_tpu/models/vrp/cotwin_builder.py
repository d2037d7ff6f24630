"""VRP cotwin + fused TPU score kernels — the flagship workload.

Reference: `/root/reference/examples/vrp/src/persistence/cotwin_builder.rs`
(two planning vars per stop — vehicle_id with semantic groups
["vehicle_assignment", "common"], customer_id with ["customer_assignment",
"common"]; capacity-aware greedy nearest-neighbour init; frozen-flag
pinning for replanning) and the score semantics of the fused all-in-one
constraint (`score/incremental_score_calculator.rs:32-142`):

  hard   = 1000 * duplicate-stops + capacity overflow
  medium = time-window lateness (+ work-day overtime)
  soft   = total route distance

TPU formulation: the prescoring step stably sorts stops by vehicle (the
reference's common_df join+sort, `plain_score_calculator.rs:39-45`) and runs
one `vrp_routes` scan producing distance and lateness together; the
duplicate and capacity penalties are bincount / segment-sum kernels. All of
it is vmapped over the population by the score requester.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from greyjack_tpu.cotwin import Cotwin, CotwinBuilderBase
from greyjack_tpu.variables import GJInteger
from greyjack_tpu.score_calculation.scores import HardMediumSoftScore
from greyjack_tpu.score_calculation.score_calculators import (
    PlainScoreCalculator,
    IncrementalScoreCalculator,
)
from greyjack_tpu.ops import segments, routes, join, moves, lexico


class CotStop:
    def __init__(self, vehicle_id, customer_id):
        self.vehicle_id = vehicle_id
        self.customer_id = customer_id

    def to_vec(self):
        return [("vehicle_id", self.vehicle_id), ("customer_id", self.customer_id)]


class CotCustomer:
    def __init__(self, customer_id, demand, time_window_start, time_window_end,
                 service_time):
        self._fields = [
            ("customer_id", customer_id),
            ("demand", demand),
            ("time_window_start", time_window_start),
            ("time_window_end", time_window_end),
            ("service_time", service_time),
        ]

    def to_vec(self):
        return list(self._fields)


class CotVehicle:
    def __init__(self, vehicle_id, capacity, depot_vec_id, work_day_start,
                 work_day_end):
        self._fields = [
            ("vehicle_id", vehicle_id),
            ("capacity", capacity),
            ("depot_vec_id", depot_vec_id),
            ("work_day_start", work_day_start),
            ("work_day_end", work_day_end),
        ]

    def to_vec(self):
        return list(self._fields)


# --- constraints ------------------------------------------------------------

def build_common(planning, facts, utils):
    """Prescoring: sort stops by vehicle + one fused route walk
    (the reference's common_df build, plus the route walks both distance and
    lateness constraints share).

    Fast path (default): gather-free joins — the vehicle sort, a sort-merge
    lookup of the packed customer-fact table (which yields the duplicate
    count for free), and the packed route kernel whose only O(N) gather is
    the chain-leg lookup. `exact_fp_scores=True` switches to the
    sequential-order kernel that reproduces the reference's f64 fold
    bit-for-bit."""
    stops = planning["planning_stops"]
    v = stops["vehicle_id"]
    c = stops["customer_id"]
    sorted_v, perm = routes.sort_stops_by_vehicle(v)

    if utils["exact_fp_scores"]:
        sorted_c = c[perm]
        tw = {}
        if utils["time_windowed"]:
            tw = dict(
                work_day_start=utils["work_day_start"],
                work_day_end=utils["work_day_end"],
                tw_start=utils["tw_start"], tw_end=utils["tw_end"],
                service_time=utils["service_time"],
            )
        dist, lateness = routes.vrp_routes(
            sorted_v, sorted_c, utils["distance_matrix"],
            utils["vehicle_depot_ids"], utils["k_vehicles"], **tw,
        )
        dups = segments.count_minus_n_unique(c, utils["n_locations"])
        demands = utils["demand_by_vec_id"][c]
        loads = segments.segment_sum(demands, v, utils["k_vehicles"])
    else:
        sorted_c = join.apply_permutation(c, perm)
        # direct row gather: measured ~20x faster than the sort-merge join at
        # population batch shapes (profile 2026-08-18: 380ms merge vs 18ms
        # gather for [2048, 1000]) — XLA's serial gather beats the
        # full-width forward-fill cascade once the batch is large
        cust_rows = utils["cust_packed"][sorted_c]
        dups = segments.count_minus_n_unique(c, utils["n_locations"])
        dist, lateness = routes.vrp_routes_packed(
            sorted_v, sorted_c, utils["dm_flat_milli"],
            utils["n_locations"], utils["k_vehicles"],
            utils["vehicle_depot_ids"],
            utils.get("work_day_start_k"), utils.get("work_day_end_k"),
            cust_rows, utils["time_windowed"],
        )
        loads = segments.segment_sum(cust_rows[:, 0], sorted_v,
                                     utils["k_vehicles"])
    return {
        "route_distance": dist,
        "route_lateness": lateness,
        "dup_count": dups,
        "vehicle_loads": loads,
    }


def no_duplicating_stops_constraint(planning, facts, utils):
    z = jnp.zeros((), jnp.float64)
    return (1000.0 * utils["dup_count"], z, z)


def capacity_constraint(planning, facts, utils):
    over = jnp.maximum(utils["vehicle_loads"] - utils["capacities"], 0)
    overflow = jnp.sum(over).astype(jnp.float64)
    z = jnp.zeros((), jnp.float64)
    return (overflow, z, z)


def minimize_distance(planning, facts, utils):
    z = jnp.zeros((), jnp.float64)
    return (z, z, utils["route_distance"])


def late_arrival_penalty(planning, facts, utils):
    z = jnp.zeros((), jnp.float64)
    return (z, utils["route_lateness"], z)


# --- delta (incremental) kernels ---------------------------------------------
# The reference's fused incremental VRP scorer patches the base tour with the
# delta rows and re-walks the routes in Rust (~20x over plain,
# `examples/vrp/src/score/incremental_score_calculator.rs:21-26,55-139`). TPU
# formulation: the ctx carries per-vehicle ROUTE BUFFERS [k, R] in stable
# (vehicle, stop-index) order — the stop index as sort key plus the per-stop
# facts (customer id, service time, window floor/end) as PAYLOAD
# columns, so a neighbour re-walks only the <= 2*DELTA_MOVE_SIZE routes its
# changed stops touch at static width R + DELTA_MOVE_SIZE with NO random
# fact gathers: removals/patches are O(K) scatters at positions read from
# `ctx["pos"]`, insertions ride a variadic `lax.sort`, and the only
# full-width gather left is the chain-leg distance lookup.
#
# R (`route_cap`) is a static per-instance bound on route length. Any
# neighbour that would grow a route beyond R scores as the stub (worst)
# score and is therefore never accepted — a documented divergence from the
# plain path, unreachable in practice (R >= 4x the mean route length, and
# capacity hard penalties repel long routes; instances with <= 64 stops or
# route_cap == n_stops are exact by construction).

_PAYLOAD_KEYS = ("r_stop", "r_c", "r_ct", "r_floor", "r_ce")


def _route_cap(n_stops, k):
    return int(min(n_stops, max(48, -(-4 * n_stops // k))))


def _payload_from_customers(cids, utils):
    """(c, service, floor=tw_start+service, tw_end) for customer ids."""
    crows = utils["cust_packed"][cids]
    cs = crows[..., 1]
    ce = crows[..., 2]
    ct = crows[..., 3]
    return cids, ct, cs + ct, ce


def _buffer_metrics(bufs, veh_ids, utils):
    """Per-route metrics straight off payload buffers.

    bufs: dict of i32[A, W] arrays (`_PAYLOAD_KEYS`), rows sorted by r_stop
    with sentinel n_stops padding (valid entries form a prefix); veh_ids:
    i32[A]. Returns (dist i64[A], late i64[A], load i32[A], length i32[A])
    with per-vehicle semantics identical to `routes.vrp_routes_packed`.
    """
    l = utils["n_locations"]
    dmf = utils["dm_flat_milli"]
    n = utils["n_stops"]
    key = bufs["r_stop"]
    rc = bufs["r_c"]
    a, wd = key.shape
    valid = key < n
    length = jnp.sum(valid, axis=1).astype(jnp.int32)
    has = length > 0

    legs = dmf[rc[:, :-1] * l + rc[:, 1:]]
    legs = jnp.where(valid[:, 1:], legs, 0)
    depots = utils["vehicle_depot_ids"][veh_ids].astype(jnp.int32)
    first = rc[:, 0]
    last_idx = jnp.maximum(length - 1, 0)
    last = jnp.take_along_axis(rc, last_idx[:, None], axis=1)[:, 0]
    ends = (dmf[depots * l + first].astype(jnp.int64)
            + dmf[last * l + depots].astype(jnp.int64))
    dist = jnp.where(has, ends + jnp.sum(legs.astype(jnp.int64), axis=1), 0)

    if not utils["time_windowed"]:
        return dist, jnp.zeros((a,), jnp.int64), length

    big = jnp.asarray(1 << 30, jnp.int32)
    ct = bufs["r_ct"]
    floor = bufs["r_floor"]
    ce = bufs["r_ce"]
    w0 = utils["work_day_start_k"][veh_ids].astype(jnp.int32)
    w1 = utils["work_day_end_k"][veh_ids].astype(jnp.int32)
    slot0 = jnp.arange(wd)[None, :] == 0
    adds = jnp.where(slot0, -big, jnp.where(valid, ct, 0))
    floors = jnp.where(slot0, jnp.maximum(w0[:, None] + ct, floor),
                       jnp.where(valid, floor, -big))
    post = routes._maxplus_scan(adds, floors)
    late = jnp.where(valid, jnp.maximum(post - ce, 0), 0)
    post_last = jnp.take_along_axis(post, last_idx[:, None], axis=1)[:, 0]
    overtime = jnp.where(has, jnp.maximum(post_last - w1, 0), 0)
    late_total = (jnp.sum(late.astype(jnp.int64), axis=1)
                  + overtime.astype(jnp.int64))
    return dist, late_total, length


def build_delta_ctx(planning, facts, utils):
    """O(N) base pass: payload route buffers + per-vehicle metrics + totals."""
    stops = planning["planning_stops"]
    v = stops["vehicle_id"].astype(jnp.int32)
    c = stops["customer_id"].astype(jnp.int32)
    n = v.shape[0]
    l = utils["n_locations"]
    k = utils["k_vehicles"]
    r = utils["route_cap"]

    counts = jnp.zeros((l,), jnp.int32).at[c].add(1)
    dups = (n - jnp.sum(counts > 0)).astype(jnp.int32)

    sorted_v, perm = routes.sort_stops_by_vehicle(v)
    posi = jnp.arange(n, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_v[1:] != sorted_v[:-1]])
    first_pos = jnp.zeros((k,), jnp.int32).at[
        jnp.where(is_first, sorted_v, k)].set(posi, mode="drop")
    rank = posi - first_pos[jnp.minimum(sorted_v, k - 1)]
    rank_c = jnp.minimum(rank, r - 1)
    r_stop = jnp.full((k, r), n, jnp.int32).at[
        sorted_v, rank_c].set(perm, mode="drop")
    pos = jnp.zeros((n,), jnp.int32).at[perm].set(rank_c)

    cid, ct, floor, ce = _payload_from_customers(c[perm], utils)
    zero = jnp.zeros((k, r), jnp.int32)
    bufs = {"r_stop": r_stop}
    for name, col in (("r_c", cid), ("r_ct", ct),
                      ("r_floor", floor), ("r_ce", ce)):
        bufs[name] = zero.at[sorted_v, rank_c].set(col, mode="drop")

    veh_ids = jnp.arange(k, dtype=jnp.int32)
    dist, late, length = _buffer_metrics(bufs, veh_ids, utils)
    load = jnp.zeros((k,), jnp.int32).at[v].add(
        utils["cust_packed"][c, 0], mode="drop")
    overflow = jnp.maximum(load - utils["capacities"], 0).astype(jnp.int64)
    # base-over-cap guard: a base whose route exceeds route_cap would have
    # its overflow stops collapsed into slot r-1 (wrong metrics). Such a
    # base can only come from initial sampling / an externally fed solution
    # (accepted deltas are never over-cap); flag it so `score_delta` can
    # poison every neighbour with the stub instead of mis-scoring silently.
    true_counts = jnp.zeros((k,), jnp.int32).at[v].add(1, mode="drop")
    base_over = jnp.any(true_counts > r)
    return {"v": v, "c": c, "counts": counts, "dups": dups, "pos": pos,
            "base_over": base_over,
            **bufs,
            "dist": dist, "late": late, "load": load, "len": length,
            "sum_dist": jnp.sum(dist), "sum_late": jnp.sum(late),
            "sum_overflow": jnp.sum(overflow)}


def _delta_parts(ctx, delta, utils):
    """Shared O(K) analysis of one delta: per-row patched (vehicle, customer)
    values, affected-route payload rebuild, exact metric deltas."""
    delta = moves.dedupe_delta(delta)
    schema = utils["delta_schema"]
    k = utils["k_vehicles"]
    r = utils["route_cap"]
    n = ctx["v"].shape[0]
    kd = delta["positions"].shape[0]

    rows = schema["var_row"][delta["positions"]]
    cols = schema["var_col"][delta["positions"]]
    valid = delta["valid"]
    nv = jnp.round(delta["values"]).astype(jnp.int32)
    is_veh = cols == 0

    # row-representative dedupe + per-row patched values (a row may have
    # both its vehicle and customer vars in the delta)
    rid = jnp.where(valid, rows, n)
    idx = jnp.arange(kd)
    eqr = rid[:, None] == rid[None, :]
    rep = valid & ~jnp.any(eqr & (idx[None, :] < idx[:, None]), axis=1)
    veh_match = eqr & is_veh[None, :] & valid[None, :]
    cust_match = eqr & (~is_veh)[None, :] & valid[None, :]
    old_v = ctx["v"][rows]
    old_c = ctx["c"][rows]
    new_v = jnp.where(jnp.any(veh_match, axis=1),
                      nv[jnp.argmax(veh_match, axis=1)], old_v)
    new_c = jnp.where(jnp.any(cust_match, axis=1),
                      nv[jnp.argmax(cust_match, axis=1)], old_c)

    d_unique = segments.nunique_delta(ctx["counts"], old_c, new_c, rep)
    new_dups = ctx["dups"] - d_unique

    # affected vehicles (old of every changed row, new of moved rows), deduped
    veh_changed = rep & (new_v != old_v)
    av = jnp.concatenate([jnp.where(rep, old_v, k),
                          jnp.where(veh_changed, new_v, k)])
    idxa = jnp.arange(2 * kd)
    eqa = av[:, None] == av[None, :]
    arep = (av < k) & ~jnp.any(eqa & (idxa[None, :] < idxa[:, None]), axis=1)
    av_safe = jnp.minimum(av, k - 1)
    # affected-list slot of each rep row's OLD vehicle (its arep occurrence)
    old_v_at = (av[None, :] == old_v[:, None]) & arep[None, :]   # [KD, 2KD]
    a_of_row = jnp.argmax(old_v_at, axis=1).astype(jnp.int32)

    # rebuild affected routes on payload buffers: patch changed customers at
    # their known slots, clear moved-away stops, append moved-in stops,
    # one variadic sort by stop index (== stable (vehicle, index) order)
    slot_of_row = ctx["pos"][rows]
    a2 = 2 * kd
    patch_a = jnp.where(rep, a_of_row, a2)
    clear_a = jnp.where(veh_changed, a_of_row, a2)
    dem_old = utils["cust_packed"][old_c, 0]
    dem_new = utils["cust_packed"][new_c, 0]
    npay = _payload_from_customers(new_c, utils)
    base = {name: ctx[name][av_safe] for name in _PAYLOAD_KEYS}
    base["r_stop"] = base["r_stop"].at[clear_a, slot_of_row].set(
        n, mode="drop")
    for name, col in zip(_PAYLOAD_KEYS[1:], npay):
        base[name] = base[name].at[patch_a, slot_of_row].set(col, mode="drop")

    ins_here = veh_changed[None, :] & (new_v[None, :] == av[:, None])
    ins = {"r_stop": jnp.where(ins_here, rows[None, :], n)}
    for name, col in zip(_PAYLOAD_KEYS[1:], npay):
        ins[name] = jnp.broadcast_to(col[None, :], (a2, kd))

    operands = tuple(
        jnp.concatenate([base[name], ins[name]], axis=1)
        for name in _PAYLOAD_KEYS)
    sorted_ops = jax.lax.sort(operands, dimension=1, num_keys=1,
                              is_stable=False)
    bufs = dict(zip(_PAYLOAD_KEYS, sorted_ops))

    dist, late, length = _buffer_metrics(bufs, av_safe, utils)

    # O(K) arithmetic load update — no demand payload in the sort
    is_old = old_v[None, :] == av[:, None]          # [A, KD]
    is_new = new_v[None, :] == av[:, None]
    contrib = (
        jnp.where(veh_changed[None, :] & is_old, -dem_old[None, :], 0)
        + jnp.where(veh_changed[None, :] & is_new, dem_new[None, :], 0)
        + jnp.where(rep[None, :] & ~veh_changed[None, :] & is_old,
                    (dem_new - dem_old)[None, :], 0))
    # cast the row sum back: under x64 the i32 sum promotes to i64 and the
    # later scatter into the i32 ctx['load'] would be a hard error in
    # future JAX releases
    load = ctx["load"][av_safe] + jnp.sum(contrib, axis=1).astype(jnp.int32)

    cap_a = utils["capacities"][av_safe]
    m = arep
    d_dist = jnp.sum(jnp.where(m, dist - ctx["dist"][av_safe], 0))
    d_late = jnp.sum(jnp.where(m, late - ctx["late"][av_safe], 0))
    d_over = jnp.sum(jnp.where(
        m,
        jnp.maximum(load - cap_a, 0).astype(jnp.int64)
        - jnp.maximum(ctx["load"][av_safe] - cap_a, 0).astype(jnp.int64),
        0))
    over_cap = jnp.any(m & (length > r))
    return {"rows": rows, "rep": rep, "new_v": new_v, "new_c": new_c,
            "old_c": old_c, "av": av, "arep": arep, "bufs": bufs,
            "dist": dist, "late": late, "load": load, "len": length,
            "d_dist": d_dist, "d_late": d_late, "d_over": d_over,
            "new_dups": new_dups, "over_cap": over_cap}


def score_delta(ctx, delta, utils):
    """O(K)-per-neighbour score, bitwise-equal to the plain fast path."""
    p = _delta_parts(ctx, delta, utils)
    hard = (1000.0 * p["new_dups"].astype(jnp.float64)
            + (ctx["sum_overflow"] + p["d_over"]).astype(jnp.float64))
    medium = (ctx["sum_late"] + p["d_late"]).astype(jnp.float64)
    soft = (ctx["sum_dist"] + p["d_dist"]).astype(jnp.float64) / 1000.0
    row = jnp.stack([hard, medium, soft])
    return jnp.where(p["over_cap"] | ctx["base_over"],
                     lexico.stub_score_row(3), row)


def update_ctx(ctx, delta, utils):
    """Apply one ACCEPTED delta to the ctx (identity for all-invalid
    deltas; over-cap deltas are never accepted — their score is the stub)."""
    p = _delta_parts(ctx, delta, utils)
    k = utils["k_vehicles"]
    l = utils["n_locations"]
    r = utils["route_cap"]
    n = ctx["v"].shape[0]
    rowsel = jnp.where(p["rep"], p["rows"], n)
    vehsel = jnp.where(p["arep"], p["av"], k)
    out = dict(ctx)
    out["v"] = ctx["v"].at[rowsel].set(p["new_v"], mode="drop")
    out["c"] = ctx["c"].at[rowsel].set(p["new_c"], mode="drop")
    out["counts"] = (
        ctx["counts"]
        .at[jnp.where(p["rep"], p["old_c"], l)].add(-1, mode="drop")
        .at[jnp.where(p["rep"], p["new_c"], l)].add(1, mode="drop"))
    out["dups"] = p["new_dups"]
    # zero payloads in sentinel slots so the updated ctx is leaf-identical
    # to a fresh `build_delta_ctx` of the patched candidate (tested invariant)
    new_stop_r = p["bufs"]["r_stop"][:, :r]
    valid_r = new_stop_r < n
    out["r_stop"] = ctx["r_stop"].at[vehsel].set(new_stop_r, mode="drop")
    for name in _PAYLOAD_KEYS[1:]:
        out[name] = ctx[name].at[vehsel].set(
            jnp.where(valid_r, p["bufs"][name][:, :r], 0), mode="drop")
    # slots shifted inside every affected route: rewrite pos for their stops
    new_stop = p["bufs"]["r_stop"][:, :r]
    slot_idx = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[None, :],
                                new_stop.shape)
    pos_tgt = jnp.where((new_stop < n) & p["arep"][:, None], new_stop, n)
    out["pos"] = ctx["pos"].at[pos_tgt].set(slot_idx, mode="drop")
    out["dist"] = ctx["dist"].at[vehsel].set(p["dist"], mode="drop")
    out["late"] = ctx["late"].at[vehsel].set(p["late"], mode="drop")
    out["load"] = ctx["load"].at[vehsel].set(p["load"], mode="drop")
    out["len"] = ctx["len"].at[vehsel].set(p["len"], mode="drop")
    out["sum_dist"] = ctx["sum_dist"] + p["d_dist"]
    out["sum_late"] = ctx["sum_late"] + p["d_late"]
    out["sum_overflow"] = ctx["sum_overflow"] + p["d_over"]
    return out


# --- greedy init (device) ---------------------------------------------------

def greedy_init(dm, demands, capacities, depot_ids, n_depots):
    """Capacity-aware nearest-neighbour fill, vehicle by vehicle — the
    reference's host loop (`cotwin_builder.rs:153-255`) as one `lax.scan`.
    Returns (vehicle_ids, customer_ids, valid) of length n_stops + k; invalid
    rows mean "no greedy slot" (left to uniform init, as the reference pads
    with None)."""
    l = dm.shape[0]
    k = capacities.shape[0]
    n_stops = l - n_depots
    steps = n_stops + k

    def body(carry, _):
        remaining, veh, prev, load = carry
        d = jnp.where(remaining, dm[prev], jnp.inf)
        cand = jnp.argmin(d).astype(jnp.int32)
        cand_demand = demands[cand]
        veh_ok = veh < k
        any_left = jnp.any(remaining)
        fits = veh_ok & any_left & (load + cand_demand <= capacities[jnp.minimum(veh, k - 1)])
        # assign or advance to the next vehicle (reference `break`)
        new_remaining = jnp.where(fits, remaining.at[cand].set(False), remaining)
        new_veh = jnp.where(fits, veh, veh + 1)
        new_prev = jnp.where(
            fits, cand, depot_ids[jnp.minimum(new_veh, k - 1)].astype(jnp.int32)
        )
        new_load = jnp.where(fits, load + cand_demand, 0)
        out = (jnp.where(fits, veh, -1), jnp.where(fits, cand, -1))
        return (new_remaining, new_veh, new_prev, new_load), out

    remaining0 = jnp.zeros((l,), bool).at[n_depots:].set(True)
    init = (remaining0, jnp.int32(0),
            depot_ids[0].astype(jnp.int32), jnp.int64(0))
    _, (veh_out, cust_out) = jax.lax.scan(body, init, None, length=steps)
    return veh_out, cust_out


class CotwinBuilder(CotwinBuilderBase):
    def __init__(self, use_incremental_score_calculation=True,
                 use_greed_init=True, exact_fp_scores=False):
        self.use_incremental_score_calculation = use_incremental_score_calculation
        self.use_greed_init = use_greed_init
        self.exact_fp_scores = exact_fp_scores

    def _initial_ids(self, domain, is_already_initialized):
        n_depots = len(domain.depot_vec)
        n_locations = len(domain.customers_vec)
        n_stops = n_locations - n_depots
        k = len(domain.vehicles)
        initial_vehicle = [None] * n_stops
        initial_customer = [None] * n_stops
        frozen = [False] * n_stops

        if is_already_initialized:
            i = 0
            for kk, vehicle in enumerate(domain.vehicles):
                for customer in vehicle.customers:
                    initial_vehicle[i] = kk
                    initial_customer[i] = customer.vec_id
                    frozen[i] = customer.frozen
                    i += 1
        elif self.use_greed_init:
            demands = jnp.asarray(
                np.array([c.demand for c in domain.customers_vec], np.int64)
            )
            capacities = jnp.asarray(
                np.array([v.capacity for v in domain.vehicles], np.int64)
            )
            depot_ids = jnp.asarray(
                np.array([v.depot_vec_id for v in domain.vehicles], np.int32)
            )
            veh, cust = greedy_init(domain.distance_matrix, demands,
                                    capacities, depot_ids, n_depots)
            veh, cust = np.asarray(veh), np.asarray(cust)
            valid = veh >= 0
            veh, cust = veh[valid].tolist(), cust[valid].tolist()
            for i in range(min(len(veh), n_stops)):
                initial_vehicle[i] = veh[i]
                initial_customer[i] = cust[i]
        return initial_vehicle, initial_customer, frozen

    def build_cotwin(self, domain, is_already_initialized):
        n_depots = len(domain.depot_vec)
        n_locations = len(domain.customers_vec)
        n_stops = n_locations - n_depots
        k = len(domain.vehicles)

        init_v, init_c, frozen = self._initial_ids(domain, is_already_initialized)

        stops = []
        for i in range(n_stops):
            stops.append(CotStop(
                vehicle_id=GJInteger(init_v[i], 0, k - 1, frozen[i],
                                     ["vehicle_assignment", "common"]),
                customer_id=GJInteger(init_c[i], n_depots, n_locations - 1,
                                      frozen[i],
                                      ["customer_assignment", "common"]),
            ))

        fact_customers = [
            CotCustomer(c.vec_id, c.demand, c.time_window_start,
                        c.time_window_end, c.service_time)
            for c in domain.customers_vec[n_depots:]
        ]
        fact_vehicles = [
            CotVehicle(i, v.capacity, v.depot_vec_id, v.work_day_start,
                       v.work_day_end)
            for i, v in enumerate(domain.vehicles)
        ]

        cotwin = Cotwin()
        cotwin.add_problem_facts("vehicles", fact_vehicles)
        cotwin.add_problem_facts("customers", fact_customers)
        cotwin.add_planning_entities("planning_stops", stops)

        calc_cls = (
            IncrementalScoreCalculator
            if self.use_incremental_score_calculation
            else PlainScoreCalculator
        )
        calculator = calc_cls(HardMediumSoftScore)
        cust = domain.customers_vec
        calculator.add_utility_object("distance_matrix", domain.distance_matrix)
        dm_milli = routes.distance_matrix_to_milli(domain.distance_matrix)
        calculator.add_utility_object("distance_matrix_milli", dm_milli)
        calculator.add_utility_object("dm_flat_milli", dm_milli.reshape(-1))
        calculator.add_utility_object("exact_fp_scores", self.exact_fp_scores)
        # packed per-location fact rows [L, 4]: demand, tw_start, tw_end,
        # service — one sort-merge lookup replaces four gathers
        calculator.add_utility_object(
            "cust_packed",
            jnp.asarray(np.array(
                [[c.demand, c.time_window_start, c.time_window_end,
                  c.service_time] for c in cust], np.int32)))
        calculator.add_utility_object(
            "work_day_start_k",
            jnp.asarray(np.array([v.work_day_start for v in domain.vehicles],
                                 np.int32)))
        calculator.add_utility_object(
            "work_day_end_k",
            jnp.asarray(np.array([v.work_day_end for v in domain.vehicles],
                                 np.int32)))
        calculator.add_utility_object("n_locations", n_locations)
        calculator.add_utility_object("k_vehicles", k)
        calculator.add_utility_object("time_windowed", domain.time_windowed)
        calculator.add_utility_object(
            "demand_by_vec_id",
            jnp.asarray(np.array([c.demand for c in cust], np.int32)))
        calculator.add_utility_object(
            "capacities",
            jnp.asarray(np.array([v.capacity for v in domain.vehicles], np.int32)))
        calculator.add_utility_object(
            "vehicle_depot_ids",
            jnp.asarray(np.array([v.depot_vec_id for v in domain.vehicles], np.int32)))
        if domain.time_windowed:
            calculator.add_utility_object(
                "work_day_start",
                jnp.asarray(np.array([v.work_day_start for v in domain.vehicles], np.int32)))
            calculator.add_utility_object(
                "work_day_end",
                jnp.asarray(np.array([v.work_day_end for v in domain.vehicles], np.int32)))
            calculator.add_utility_object(
                "tw_start",
                jnp.asarray(np.array([c.time_window_start for c in cust], np.int32)))
            calculator.add_utility_object(
                "tw_end",
                jnp.asarray(np.array([c.time_window_end for c in cust], np.int32)))
            calculator.add_utility_object(
                "service_time",
                jnp.asarray(np.array([c.service_time for c in cust], np.int32)))

        calculator.add_utility_object("route_cap", _route_cap(n_stops, k))
        calculator.add_utility_object("n_stops", n_stops)
        calculator.add_prescoring_function("build_common", build_common)
        calculator.add_constraint("no_duplicating_stops_constraint",
                                  no_duplicating_stops_constraint)
        calculator.add_constraint("capacity_constraint", capacity_constraint)
        calculator.add_constraint("minimize_distance", minimize_distance)
        calculator.add_constraint("late_arrival_penalty", late_arrival_penalty)
        if not domain.time_windowed:
            calculator.remove_constraint("late_arrival_penalty")
        if self.use_incremental_score_calculation and not self.exact_fp_scores:
            calculator.set_delta_kernels(build_delta_ctx, score_delta,
                                         update_ctx)
        cotwin.add_score_calculator(calculator)
        return cotwin
