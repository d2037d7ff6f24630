"""Shared agent machinery: device state pytree + the per-step contract.

The reference `Agent` (`greyjack/src/agents/base/agent_base.rs:31-188`) is an
OS thread mutating a `Vec<Individual>`; here an agent ("island") is a pure
state pytree advanced by a jitted step function, and `n_jobs` islands are a
leading vmap/mesh axis (SURVEY.md §2.3). Individuals never exist on the hot
path — the population is a dense `f64[P, V]` plus a score block `f64[P, S]`.

A metaheuristic provides:
    init_state(key)          -> state pytree (per island)
    step(key, state, extras) -> state pytree

`extras` carries host-injected per-chunk scalars (currently the SA
auto-temperature `inverted_accomplish_rate`, reference
`agent_base.rs:537-552`).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from greyjack_tpu.ops import lexico
from greyjack_tpu.utils.math_utils import round_decimal_jnp

STUB = sys.float_info.max - 1.0


class MetaheuristicKernel:
    """Bundle of device closures handed to the island runner.

    `refresh` (optional) re-derives state that is a pure function of the
    population — e.g. the delta-scoring ctx — after the runner replaces
    individuals behind the kernel's back (migration, global-best adoption).
    Called once per chunk, so an O(N) rebuild is amortized over
    `migration_frequency` O(K) steps."""

    def __init__(self, builder, init_state, step, refresh=None,
                 self_gating=False, prestep=None, path=None,
                 moves_per_step=None):
        self.builder = builder
        self.init_state = init_state
        self.step = step
        self.refresh = refresh
        # which scoring path this kernel compiled to ("sweep" /
        # "int-delta" / "delta" / "plain") — surfaced by the solver so a
        # silent fallback is visible (ADVICE r4)
        self.path = path
        # scored candidates per island-step for throughput accounting; a
        # static LOWER bound for sweep kernels (no device reads needed)
        self.moves_per_step = moves_per_step
        # prestep(batched_state) -> extras dict, computed OUTSIDE the
        # island vmap once per step (e.g. the tabu free-list build, whose
        # compaction scatter lowers badly as a vmap-batched scatter)
        self.prestep = prestep
        self.metaheuristic_kind = builder.metaheuristic_kind
        self.population_size = builder.population_size
        self.migration_rate = builder.migration_rate
        # self_gating: the step reads extras["_active"] (bool, per island)
        # and freezes ALL its state writes itself when False — the runner
        # then skips the per-step `mask_state` where-tree over the whole
        # island state (ctx tables + population + tabu, ~25 select ops and
        # a broken scan-carry alias per step at flagship shapes)
        self.self_gating = self_gating


def make_rounded_ints_to_row_fn(requester, score_precision):
    """(int_totals i64[..., S]) -> f64[..., S] score rows, decimal-rounded
    when `score_precision` is set.

    The mapping `f64 = ints / scales` (scales from
    `set_delta_kernels(int_scales=...)`) reproduces the plain scorer's f64
    construction bit-for-bit, so rounding here equals rounding a full
    rescore (`agent_base.rs:284-287`) — this is what keeps the int-delta
    and sweep fast paths live under `score_precision` (VERDICT r4 item 3).
    Requires `requester.supports_rounded_fast_paths` when precision is set.
    """
    scales = requester.score_int_scales

    def fn(ints):
        row = ints.astype(jnp.float64) / scales
        if score_precision is not None:
            row = round_decimal_jnp(row, list(score_precision))
        return row

    return fn


def fast_paths_ok(requester, score_precision):
    """True when the int-delta / sweep fast paths are usable at this
    precision: always for unrounded scores; for rounded scores only when
    the model registered its exact integer totals (rounding then happens
    at the accept boundary, see `make_rounded_ints_to_row_fn`)."""
    if score_precision is None:
        return True
    return requester.supports_rounded_fast_paths


def announce_fallback(builder, requester, score_precision):
    """Loud downgrade warning when a requested sweep mode cannot engage
    (ADVICE r4: a user asking for sweep=True previously got no signal
    about which path actually ran)."""
    import warnings

    if not requester.supports_sweep:
        reason = ("the model registered no eligible sweep module for this "
                  "instance")
    elif not fast_paths_ok(requester, score_precision):
        reason = ("score_precision is set and the model did not register "
                  "exact integer totals (set_delta_kernels(ctx_ints=...)) "
                  "for accept-boundary rounding")
    else:
        return
    warnings.warn(
        f"{builder.metaheuristic_name}: sweep=True requested but the sweep "
        f"fast path cannot engage — {reason}; falling back to the "
        "random-move path (orders of magnitude fewer scored moves/s)",
        RuntimeWarning, stacklevel=3)


def make_score_fn(requester, score_precision=None):
    """population [P, V] -> scores [P, S], with optional truncating decimal
    rounding per component (`agent_base.rs:284-287`)."""
    if score_precision is not None:
        precision = jnp.asarray(list(score_precision), dtype=jnp.float64)

        def fn(population):
            scores = requester.request_score_plain(population)
            return round_decimal_jnp(scores, precision)

        return fn
    return requester.request_score_plain


def make_delta_score_fn(requester, score_precision=None):
    """(ctx, deltas [n, K]) -> scores [n, S] with optional decimal rounding.
    The delta math is exact integer arithmetic, so base+delta then round
    equals full-rescore then round."""
    if score_precision is not None:
        precision = jnp.asarray(list(score_precision), dtype=jnp.float64)

        def fn(ctx, deltas):
            scores = requester.request_score_delta(ctx, deltas)
            return round_decimal_jnp(scores, precision)

        return fn
    return requester.request_score_delta


def base_state(population, scores):
    """Common per-island state fields."""
    top_idx = lexico.lex_argmin(scores)
    return {
        "population": population,
        "scores": scores,
        "top_values": population[top_idx],
        "top_score": scores[top_idx],
        "step_id": jnp.zeros((), jnp.int32),
    }


def update_top(state):
    """Refresh the agent-best from the current population
    (`agent_base.rs:220-224`: `population[0] <= agent_top` after sort)."""
    idx = lexico.lex_argmin(state["scores"])
    cand_score = state["scores"][idx]
    better = lexico.lex_leq(cand_score, state["top_score"])
    state = dict(state)
    state["top_values"] = jnp.where(better, state["population"][idx], state["top_values"])
    state["top_score"] = jnp.where(better, cand_score, state["top_score"])
    return state


def mask_state(new_state, old_state, alive):
    """Freeze dead islands: keep old state where `alive` is False
    (`agent_base.rs:137-146`: dead agents stop stepping but keep relaying).

    State leaves have a leading island axis; `alive` is bool[I].
    """

    def sel(n, o):
        mask = jnp.reshape(alive, alive.shape + (1,) * (n.ndim - 1))
        return jnp.where(mask, n, o)

    return jax.tree.map(sel, new_state, old_state)
