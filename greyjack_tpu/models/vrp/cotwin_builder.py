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
from greyjack_tpu.ops import segments, routes, join


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

        calculator.add_prescoring_function("build_common", build_common)
        calculator.add_constraint("no_duplicating_stops_constraint",
                                  no_duplicating_stops_constraint)
        calculator.add_constraint("capacity_constraint", capacity_constraint)
        calculator.add_constraint("minimize_distance", minimize_distance)
        calculator.add_constraint("late_arrival_penalty", late_arrival_penalty)
        if not domain.time_windowed:
            calculator.remove_constraint("late_arrival_penalty")
        cotwin.add_score_calculator(calculator)
        return cotwin
