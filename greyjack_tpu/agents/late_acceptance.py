"""LateAcceptance — Burke–Bykov late acceptance hill climbing.

Reference: `greyjack/src/agents/late_acceptance.rs:16-75` and
`late_acceptance_base.rs:29-253`: keep a deque of the last
`late_acceptance_size` *accepted* scores; accept a candidate iff its score
<= the deque's oldest entry OR <= the current best. The deque becomes a
fixed-size ring buffer on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from greyjack_tpu.agents import base
from greyjack_tpu.ops import lexico, moves


def ring_init(size, score_size):
    return {
        "buf": jnp.zeros((size, score_size), jnp.float64),
        "count": jnp.zeros((), jnp.int32),
        "head": jnp.zeros((), jnp.int32),  # next write slot
    }


def ring_oldest(ring, fallback):
    """VecDeque.back() — the oldest retained score; `fallback` when empty."""
    size = ring["buf"].shape[0]
    idx = (ring["head"] - ring["count"]) % size
    value = ring["buf"][idx]
    return jnp.where(ring["count"] > 0, value, fallback)


def ring_push_front(ring, score, enable):
    """push_front + bounded pop_back (`late_acceptance_base.rs:172-180`);
    no-op when `enable` is False."""
    size = ring["buf"].shape[0]
    buf = jnp.where(enable, ring["buf"].at[ring["head"]].set(score), ring["buf"])
    head = jnp.where(enable, (ring["head"] + 1) % size, ring["head"])
    count = jnp.where(enable, jnp.minimum(ring["count"] + 1, size), ring["count"])
    return {"buf": buf, "count": count, "head": head}


class LateAcceptance:
    metaheuristic_kind = "LocalSearch"
    metaheuristic_name = "LateAcceptance"

    def __init__(self, late_acceptance_size, tabu_entity_rate,
                 mutation_rate_multiplier, move_probas, migration_frequency,
                 termination_strategy, sweep=False, sweep_targets=None,
                 sweep_window=None):
        self.late_acceptance_size = int(late_acceptance_size)
        self.tabu_entity_rate = float(tabu_entity_rate)
        self.mutation_rate_multiplier = mutation_rate_multiplier
        self.move_probas = move_probas
        self.migration_frequency = int(migration_frequency)
        self.termination_strategy = termination_strategy
        # sweep-neighbourhood mode (see TabuSearch): the per-step candidate
        # is the sweep winner instead of ONE random move — a deliberately
        # stronger proposal under the same late-acceptance rule
        self.sweep = bool(sweep)
        self.sweep_targets = sweep_targets
        self.sweep_window = sweep_window
        self.population_size = 1
        self.migration_rate = 1.0

    def build_kernel(self, requester, score_precision=None):
        vm = requester.variables_manager
        cfg = moves.MoverConfig(vm, self.tabu_entity_rate,
                                self.mutation_rate_multiplier, self.move_probas)
        score_fn = base.make_score_fn(requester, score_precision)
        s = requester.score_size

        precision_ok = base.fast_paths_ok(requester, score_precision)
        if self.sweep and requester.supports_sweep and precision_ok:
            return self._build_sweep_kernel(requester, cfg, score_fn, s,
                                            score_precision)
        if self.sweep:
            base.announce_fallback(self, requester, score_precision)

        if requester.supports_delta:
            # incremental mode: one O(K) delta per step against the ctx in
            # state (`late_acceptance_base.rs:188-241` semantics)
            delta_score_fn = base.make_delta_score_fn(requester,
                                                      score_precision)

            def init_state(key):
                population = vm.sample_variables(key, 1)
                scores = score_fn(population)
                state = base.base_state(population, scores)
                state["tabu"] = cfg.init_tabu_state()
                state["late"] = ring_init(self.late_acceptance_size, s)
                state["ctx"] = requester.build_base_ctx(population[0])
                return state

            def step(key, state, extras):
                k_move, _ = jax.random.split(key)
                base_row = state["population"][0]
                deltas, info = moves.move_population_delta(
                    k_move, base_row, 1, vm, cfg, state["tabu"])
                cand_score = delta_score_fn(state["ctx"], deltas)[0]
                compare_to = ring_oldest(state["late"], state["scores"][0])
                accept = lexico.lex_leq(cand_score, compare_to) | \
                    lexico.lex_leq(cand_score, state["scores"][0])
                winner = jax.tree.map(lambda x: x[0], deltas)
                winner = {**winner, "valid": winner["valid"] & accept}
                new_row = moves.apply_delta(base_row, winner)
                state = dict(state)
                state["late"] = ring_push_front(state["late"], cand_score,
                                                accept)
                state["population"] = new_row[None, :]
                state["scores"] = jnp.where(accept, cand_score[None, :],
                                            state["scores"])
                state["ctx"] = requester.update_ctx(state["ctx"], winner)
                if cfg.use_tabu:
                    state["tabu"] = moves.update_tabu_from_info(
                        state["tabu"], info, 0)
                state = base.update_top(state)
                state["step_id"] = state["step_id"] + 1
                return state

            def refresh(state):
                state = dict(state)
                state["ctx"] = requester.build_base_ctx(
                    state["population"][0])
                return state

            return base.MetaheuristicKernel(self, init_state, step, refresh,
                                            path="delta", moves_per_step=1)

        def init_state(key):
            population = vm.sample_variables(key, 1)
            scores = score_fn(population)
            state = base.base_state(population, scores)
            state["tabu"] = cfg.init_tabu_state()
            state["late"] = ring_init(self.late_acceptance_size, s)
            return state

        def step(key, state, extras):
            k_move, _ = jax.random.split(key)
            current = state["population"]
            moved, info = moves.move_population(k_move, current, vm, cfg,
                                                state["tabu"])
            moved = vm.fix_all(moved)
            scores = score_fn(moved)
            cand_score = scores[0]
            compare_to = ring_oldest(state["late"], state["scores"][0])
            accept = lexico.lex_leq(cand_score, compare_to) | lexico.lex_leq(
                cand_score, state["scores"][0]
            )
            state = dict(state)
            state["late"] = ring_push_front(state["late"], cand_score, accept)
            state["population"] = jnp.where(accept, moved, state["population"])
            state["scores"] = jnp.where(accept, scores, state["scores"])
            if cfg.use_tabu:
                state["tabu"] = moves.update_tabu_from_info(state["tabu"], info, 0)
            state = base.update_top(state)
            state["step_id"] = state["step_id"] + 1
            return state

        return base.MetaheuristicKernel(self, init_state, step, path="plain",
                                        moves_per_step=1)

    def _build_sweep_kernel(self, requester, cfg, score_fn, s,
                            score_precision=None):
        """Late acceptance over sweep-winner proposals: the candidate each
        step is the best of the dense value sweeps (`models/vrp/sweep.py`),
        accepted iff <= the ring's oldest entry OR <= the current best —
        the reference rule (`late_acceptance_base.rs:143-186`) over a
        stronger proposal distribution (documented divergence)."""
        from greyjack_tpu.ops import selection

        vm = requester.variables_manager
        mod = requester.sweep_module
        sweep_cfg = mod.SweepConfig(requester, self.sweep_targets,
                                    self.sweep_window)
        utils = requester._delta_utils()
        # accept-boundary rounding under score_precision (see TabuSearch)
        ints_to_row = (base.make_rounded_ints_to_row_fn(
            requester, score_precision)
            if score_precision is not None else None)

        def init_state(key):
            population = vm.sample_variables(key, 1)
            scores = score_fn(population)
            state = base.base_state(population, scores)
            state["tabu"] = cfg.init_tabu_state()
            state["late"] = ring_init(self.late_acceptance_size, s)
            state["ctx"] = requester.build_base_ctx(population[0])
            state["sweep_scored"] = jnp.zeros((), jnp.int64)
            state["sweep_nonconv"] = jnp.zeros((), jnp.int64)
            return state

        def step(key, state, extras):
            active = extras.get("_active", jnp.bool_(True))
            free = extras.get("_free")
            if free is None:
                free = cfg.tabu_free(state["tabu"])
            masks = cfg.tabu_masks(state["tabu"])
            delta, exact, info, stats = mod.propose(
                key, state["ctx"], free, masks, sweep_cfg, utils)
            if ints_to_row is None:
                cand_score = mod.exact_score_row(state["ctx"], exact, utils)
            else:
                cand_score = ints_to_row(
                    requester.ctx_int_totals(state["ctx"])
                    + exact.astype(jnp.int64))
            compare_to = ring_oldest(state["late"], state["scores"][0])
            accept = (lexico.lex_leq(cand_score, compare_to)
                      | lexico.lex_leq(cand_score, state["scores"][0])) \
                & active & (exact[0] != jnp.iinfo(jnp.int32).max)
            winner = {**delta, "valid": delta["valid"] & accept}
            base_row = state["population"][0]
            state = dict(state)
            state["late"] = ring_push_front(state["late"], cand_score,
                                            accept)
            state["population"] = moves.apply_delta(base_row, winner)[None, :]
            state["ctx"] = requester.update_ctx(state["ctx"], winner)
            state["scores"] = jnp.where(accept, cand_score[None, :],
                                        state["scores"])
            if cfg.use_tabu:
                state["tabu"] = selection.tabu_push(
                    state["tabu"], info["group"], info["positions"],
                    jnp.where(active, info["count"], 0))
            state["sweep_scored"] = state["sweep_scored"] + jnp.where(
                active, stats["n_scored"], 0)
            state["sweep_nonconv"] = state["sweep_nonconv"] + jnp.where(
                active, stats["n_nonconv"], 0)
            state = base.update_top(state)
            state["step_id"] = state["step_id"] + active.astype(
                state["step_id"].dtype)
            return state

        def refresh(state):
            state = dict(state)
            state["ctx"] = requester.build_base_ctx(state["population"][0])
            return state

        def prestep(batched_state):
            return {"_free": cfg.tabu_free(batched_state["tabu"])}

        return base.MetaheuristicKernel(
            self, init_state, step, refresh, self_gating=True,
            prestep=prestep, path="sweep",
            moves_per_step=sweep_cfg.conservative_moves_per_step(
                utils, self.tabu_entity_rate))
