"""TSP cotwin + TPU score kernels.

Reference: `/root/reference/examples/tsp/src/persistence/cotwin_builder.rs`
(one GJInteger location id per stop, bounds 1..L-1, greedy nearest-neighbour
init) and `score/plain_score_calculator.rs:26-87` / the fused
`all_in_one_constraint` (`incremental_score_calculator.rs:31-86`): hard =
duplicate stops, soft = tour distance. The greedy init runs on device as a
`lax.scan` over masked argmin (the reference's host loop,
`cotwin_builder.rs:139-168`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from greyjack_tpu.cotwin import Cotwin, CotwinBuilderBase
from greyjack_tpu.variables import GJInteger
from greyjack_tpu.score_calculation.scores import HardSoftScore
from greyjack_tpu.score_calculation.score_calculators import (
    PlainScoreCalculator,
    IncrementalScoreCalculator,
)
from greyjack_tpu.ops import segments, routes


class CotStop:
    def __init__(self, stop_id, locations_vec_id):
        self.stop_id = stop_id
        self.locations_vec_id = locations_vec_id

    def to_vec(self):
        return [
            ("stop_id", self.stop_id),
            ("locations_vec_id", self.locations_vec_id),
        ]


@jax.jit
def greedy_tour(dm):
    """Nearest-neighbour tour from the depot (location 0), on device.
    Returns int32[L-1] location ids."""
    l = dm.shape[0]

    def body(carry, _):
        visited, prev = carry
        d = jnp.where(visited, jnp.inf, dm[prev])
        nxt = jnp.argmin(d).astype(jnp.int32)
        return (visited.at[nxt].set(True), nxt), nxt

    visited0 = jnp.zeros((l,), bool).at[0].set(True)
    _, tour = jax.lax.scan(body, (visited0, jnp.int32(0)), None, length=l - 1)
    return tour


def no_duplicating_stops_constraint(planning, facts, utils):
    stops = planning["path_stops"]["locations_vec_id"]
    n_locations = utils["n_locations"]
    hard = segments.count_minus_n_unique(stops, n_locations)
    return (hard, jnp.zeros((), jnp.float64))


def minimize_distance(planning, facts, utils):
    stops = planning["path_stops"]["locations_vec_id"]
    if utils["exact_fp_scores"]:
        soft = routes.tour_distance(stops, utils["distance_matrix"], depot=0)
    else:
        soft = routes.tour_distance_fast(stops, utils["distance_matrix_milli"],
                                         depot=0)
    return (jnp.zeros((), jnp.float64), soft)


class CotwinBuilder(CotwinBuilderBase):
    def __init__(self, use_incremental_score_calculation=True,
                 use_greed_init=True, exact_fp_scores=False):
        self.use_incremental_score_calculation = use_incremental_score_calculation
        self.use_greed_init = use_greed_init
        self.exact_fp_scores = exact_fp_scores

    def build_cotwin(self, domain, is_already_initialized):
        n_locations = len(domain.locations_vec)
        n_stops = n_locations - 1

        if is_already_initialized and domain.trip_path:
            initial_ids = [int(i) for i in domain.trip_path]
        elif self.use_greed_init:
            initial_ids = np.asarray(greedy_tour(domain.distance_matrix)).tolist()
        else:
            initial_ids = [i + 1 for i in range(n_stops)]

        stops = []
        for i in range(n_stops):
            stops.append(
                CotStop(
                    stop_id=i,
                    locations_vec_id=GJInteger(initial_ids[i], 1,
                                               n_locations - 1, False, None),
                )
            )

        cotwin = Cotwin()
        cotwin.add_planning_entities("path_stops", stops)

        calc_cls = (
            IncrementalScoreCalculator
            if self.use_incremental_score_calculation
            else PlainScoreCalculator
        )
        calculator = calc_cls(HardSoftScore)
        calculator.add_utility_object("distance_matrix", domain.distance_matrix)
        calculator.add_utility_object(
            "distance_matrix_milli",
            routes.distance_matrix_to_milli(domain.distance_matrix))
        calculator.add_utility_object("exact_fp_scores", self.exact_fp_scores)
        calculator.add_utility_object("n_locations", n_locations)
        calculator.add_constraint("no_duplicating_stops_constraint",
                                  no_duplicating_stops_constraint)
        calculator.add_constraint("minimize_distance", minimize_distance)
        cotwin.add_score_calculator(calculator)
        return cotwin
