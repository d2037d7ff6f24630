"""SimulatedAnnealing — per-score-component temperatures.

Reference: `greyjack/src/agents/simulated_annealing.rs:15-79` and
`simulated_annealing_base.rs:29-244`: geometric cooling with floor 1e-7, or
(when cooling_rate is None) temperature = 1 - accomplish_rate injected each
step by the agent (`agent_base.rs:537-552`). Metropolis acceptance uses the
product over components of exp(-delta_i / T_i).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from greyjack_tpu.agents import base
from greyjack_tpu.ops import lexico, moves


class SimulatedAnnealing:
    metaheuristic_kind = "LocalSearch"
    metaheuristic_name = "SimulatedAnnealing"

    def __init__(self, initial_temperature, cooling_rate, tabu_entity_rate,
                 mutation_rate_multiplier, move_probas, migration_frequency,
                 termination_strategy, sweep=False, sweep_targets=None,
                 sweep_window=None):
        self.initial_temperature = [float(t) for t in initial_temperature]
        self.cooling_rate = cooling_rate
        self.tabu_entity_rate = float(tabu_entity_rate)
        self.mutation_rate_multiplier = mutation_rate_multiplier
        self.move_probas = move_probas
        self.migration_frequency = int(migration_frequency)
        self.termination_strategy = termination_strategy
        # sweep-neighbourhood mode (see TabuSearch): the per-step candidate
        # is the sweep winner, Metropolis-accepted under the same
        # per-component temperatures — a stronger proposal distribution
        # under unchanged acceptance semantics (documented divergence)
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
        if len(self.initial_temperature) != s:
            raise ValueError(
                "initial_temperature length must equal score component count"
            )
        t0 = jnp.asarray(self.initial_temperature, jnp.float64)
        cooling = self.cooling_rate

        precision_ok = base.fast_paths_ok(requester, score_precision)
        if self.sweep and requester.supports_sweep and precision_ok:
            return self._build_sweep_kernel(requester, cfg, score_fn, s, t0,
                                            cooling, score_precision)
        if self.sweep:
            base.announce_fallback(self, requester, score_precision)

        if requester.supports_delta:
            # incremental mode: one O(K) delta per step against the ctx in
            # state (`simulated_annealing_base.rs:189-233` semantics)
            delta_score_fn = base.make_delta_score_fn(requester,
                                                      score_precision)

            def init_state(key):
                population = vm.sample_variables(key, 1)
                scores = score_fn(population)
                state = base.base_state(population, scores)
                state["tabu"] = cfg.init_tabu_state()
                state["temperature"] = t0
                state["ctx"] = requester.build_base_ctx(population[0])
                return state

            def step(key, state, extras):
                k_move, k_accept = jax.random.split(key)
                base_row = state["population"][0]
                deltas, info = moves.move_population_delta(
                    k_move, base_row, 1, vm, cfg, state["tabu"])
                cand_score = delta_score_fn(state["ctx"], deltas)[0]

                if cooling is not None:
                    temp = state["temperature"] * cooling
                    temp = jnp.where(temp < 1e-6, 1e-7, temp)
                else:
                    temp = jnp.broadcast_to(
                        extras["inverted_accomplish_rate"], (s,))
                d = cand_score - state["scores"][0]
                accept_proba = jnp.prod(jnp.exp(-(d / temp)))
                u = jax.random.uniform(k_accept, (), dtype=jnp.float64)
                accept = lexico.lex_leq(cand_score, state["scores"][0]) | \
                    (u < accept_proba)

                winner = jax.tree.map(lambda x: x[0], deltas)
                winner = {**winner, "valid": winner["valid"] & accept}
                new_row = moves.apply_delta(base_row, winner)
                state = dict(state)
                state["temperature"] = temp
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
            state["temperature"] = t0
            return state

        def step(key, state, extras):
            k_move, k_accept = jax.random.split(key)
            moved, info = moves.move_population(k_move, state["population"], vm,
                                                cfg, state["tabu"])
            moved = vm.fix_all(moved)
            scores = score_fn(moved)
            cand_score = scores[0]

            if cooling is not None:
                # geometric cooling with 1e-7 floor (`:156-165`)
                temp = state["temperature"] * cooling
                temp = jnp.where(temp < 1e-6, 1e-7, temp)
            else:
                # auto temperature from termination accomplish rate (`:164`)
                temp = jnp.broadcast_to(extras["inverted_accomplish_rate"], (s,))
            deltas = cand_score - state["scores"][0]
            accept_proba = jnp.prod(jnp.exp(-(deltas / temp)))
            u = jax.random.uniform(k_accept, (), dtype=jnp.float64)
            accept = lexico.lex_leq(cand_score, state["scores"][0]) | (u < accept_proba)

            state = dict(state)
            state["temperature"] = temp
            state["population"] = jnp.where(accept, moved, state["population"])
            state["scores"] = jnp.where(accept, scores, state["scores"])
            if cfg.use_tabu:
                state["tabu"] = moves.update_tabu_from_info(state["tabu"], info, 0)
            state = base.update_top(state)
            state["step_id"] = state["step_id"] + 1
            return state

        return base.MetaheuristicKernel(self, init_state, step, path="plain",
                                        moves_per_step=1)

    def _build_sweep_kernel(self, requester, cfg, score_fn, s, t0, cooling,
                            score_precision=None):
        """Metropolis acceptance over sweep-winner proposals (see
        `models/vrp/sweep.py` / `models/tsp/sweep.py`): the candidate is
        the best of the dense value sweeps; acceptance keeps the
        reference's product-of-exponentials rule
        (`simulated_annealing_base.rs:167-183`)."""
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
            state["temperature"] = t0
            state["ctx"] = requester.build_base_ctx(population[0])
            state["sweep_scored"] = jnp.zeros((), jnp.int64)
            state["sweep_nonconv"] = jnp.zeros((), jnp.int64)
            return state

        def step(key, state, extras):
            active = extras.get("_active", jnp.bool_(True))
            k_prop, k_accept = jax.random.split(key)
            free = extras.get("_free")
            if free is None:
                free = cfg.tabu_free(state["tabu"])
            masks = cfg.tabu_masks(state["tabu"])
            delta, exact, info, stats = mod.propose(
                k_prop, state["ctx"], free, masks, sweep_cfg, utils)
            if ints_to_row is None:
                cand_score = mod.exact_score_row(state["ctx"], exact, utils)
            else:
                cand_score = ints_to_row(
                    requester.ctx_int_totals(state["ctx"])
                    + exact.astype(jnp.int64))

            if cooling is not None:
                temp = jnp.where(active,
                                 jnp.maximum(state["temperature"] * cooling,
                                             jnp.float64(1e-7)),
                                 state["temperature"])
            else:
                temp = jnp.where(active,
                                 jnp.broadcast_to(
                                     extras["inverted_accomplish_rate"],
                                     (s,)),
                                 state["temperature"])
            d = cand_score - state["scores"][0]
            accept_proba = jnp.prod(jnp.exp(-(d / temp)))
            u = jax.random.uniform(k_accept, (), dtype=jnp.float64)
            accept = (lexico.lex_leq(cand_score, state["scores"][0])
                      | (u < accept_proba)) & active \
                & (exact[0] != jnp.iinfo(jnp.int32).max)

            winner = {**delta, "valid": delta["valid"] & accept}
            base_row = state["population"][0]
            state = dict(state)
            state["temperature"] = temp
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
