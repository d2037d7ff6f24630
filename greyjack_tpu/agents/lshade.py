"""LSHADE — success-history adaptive differential evolution (Tanabe–Fukunaga)
with the reference author's MIP modifications.

Reference: `greyjack/src/agents/lshade.rs:16-108` (builder) and
`lshade_base.rs:36-432`: Cauchy-sampled F (retry-until-positive, capped at
1), Normal-sampled CR/mutation-proba around a success-history slot,
current-to-pbest/1 mutation `x + F(p - x) + F(r1 - r2)` drawing r1/r2 from
population ∪ archive, binomial crossover or a Mover-move branch,
`guarantee_of_change_size` forced columns, an external archive with random
memory pruning, and weighted-Lehmer-mean parameter adaptation.

Device mapping: the archive and the success history are one fixed-capacity
arena (`cap = history_archive_size + population_size`) with a live count;
"push" is a prefix-sum scatter, "prune" is a Gumbel-random keep-set followed
by a stable compaction sort. The retry loops become fixed-attempt draws with
a deterministic fallback (probability of exhausting attempts is negligible).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from greyjack_tpu.agents import base
from greyjack_tpu.ops import lexico, moves


def _priority(scores):
    """`get_priority_score`: first positive level else last
    (`hard_soft_score.rs:30-36`)."""
    s = scores.shape[-1]
    out = scores[..., -1]
    for i in range(s - 2, -1, -1):
        out = jnp.where(scores[..., i] > 0.0, scores[..., i], out)
    return out


class LSHADE:
    metaheuristic_kind = "Population"
    metaheuristic_name = "LSHADE"

    def __init__(self, population_size, history_archive_size, p_best_rate,
                 memory_pruning_rate, guarantee_of_change_size, initial_f,
                 initial_cr, initial_mutation_proba, tabu_entity_rate,
                 mutation_rate_multiplier, move_probas, migration_rate,
                 migration_frequency, termination_strategy):
        self.population_size = int(population_size)
        self.history_archive_size = int(history_archive_size)
        self.p_best_rate = float(p_best_rate)
        self.memory_pruning_rate = float(memory_pruning_rate)
        self.guarantee_of_change_size = int(guarantee_of_change_size)
        self.initial_f = float(initial_f)
        self.initial_cr = float(initial_cr)
        self.initial_mutation_proba = float(initial_mutation_proba)
        self.tabu_entity_rate = float(tabu_entity_rate)
        self.mutation_rate_multiplier = mutation_rate_multiplier
        self.move_probas = move_probas
        self.migration_rate = float(migration_rate)
        self.migration_frequency = int(migration_frequency)
        self.termination_strategy = termination_strategy

    def build_kernel(self, requester, score_precision=None):
        vm = requester.variables_manager
        cfg = moves.MoverConfig(vm, self.tabu_entity_rate,
                                self.mutation_rate_multiplier, self.move_probas)
        score_fn = base.make_score_fn(requester, score_precision)
        p = self.population_size
        h = self.history_archive_size
        cap = h + p
        v = vm.variables_count
        p_best_rate = self.p_best_rate
        g_size = self.guarantee_of_change_size
        keep_after_prune = math.ceil((1.0 - self.memory_pruning_rate) * h)

        def init_state(key):
            keys = jax.random.split(key, p)
            population = jax.vmap(lambda k: vm.sample_variables(k, 1)[0])(keys)
            scores = score_fn(population)
            scores, population = lexico.lex_sort_scores_with(scores, population)
            state = base.base_state(population, scores)
            state["tabu"] = cfg.init_tabu_state()
            state["archive"] = jnp.zeros((cap, v), population.dtype)
            state["arc_f"] = jnp.zeros((cap,), jnp.float64)
            state["arc_cr"] = jnp.zeros((cap,), jnp.float64)
            state["arc_ids"] = jnp.zeros((cap,), jnp.int32)
            state["arc_count"] = jnp.zeros((), jnp.int32)
            state["adaptive_f"] = jnp.full((h,), self.initial_f)
            state["adaptive_cr"] = jnp.full((h,), self.initial_cr)
            state["adaptive_mp"] = jnp.full((h,), self.initial_mutation_proba)
            state["k"] = jnp.zeros((), jnp.int32)
            return state

        def step(key, state, extras):
            ks = jax.random.split(key, 12)
            population, scores = state["population"], state["scores"]
            prev_prio = _priority(scores)

            # --- per-candidate control parameters (`lshade_base.rs:232-246`)
            rid = jax.random.randint(ks[0], (p,), 0, h)
            cr = jnp.clip(
                state["adaptive_cr"][rid]
                + 0.1 * jax.random.normal(ks[1], (p,), jnp.float64), 0.0, 1.0)
            mp = jnp.clip(
                state["adaptive_mp"][rid]
                + 0.1 * jax.random.normal(ks[2], (p,), jnp.float64), 0.0, 1.0)
            # Cauchy F, retry-until-positive capped at 1 (`:238-242`):
            # 8 fixed attempts then fall back to the adaptive loc
            u_c = jax.random.uniform(ks[3], (p, 8), jnp.float64)
            f_draws = jnp.minimum(
                state["adaptive_f"][rid][:, None]
                + 0.1 * jnp.tan(jnp.pi * (u_c - 0.5)), 1.0)
            pos = f_draws > 0.0
            first = jnp.argmax(pos, axis=1)
            f = jnp.where(jnp.any(pos, axis=1),
                          jnp.take_along_axis(f_draws, first[:, None], 1)[:, 0],
                          jnp.maximum(state["adaptive_f"][rid], 0.1))

            # --- current-to-pbest/1 over population ∪ archive (`:247-272`)
            u_pb = jax.random.uniform(ks[4], (p,), jnp.float64,
                                      minval=1e-5, maxval=p_best_rate)
            last_top = jnp.ceil(u_pb * p).astype(jnp.int32)
            pid = jnp.floor(
                jax.random.uniform(ks[5], (p,), jnp.float64) * last_top
            ).astype(jnp.int32)
            p_best = population[pid]

            united_n = p + state["arc_count"]
            def united_row(i):
                return jnp.where((i < p)[:, None], population[jnp.minimum(i, p - 1)],
                                 state["archive"][jnp.clip(i - p, 0, cap - 1)])
            r1 = jnp.floor(jax.random.uniform(ks[6], (p,), jnp.float64)
                           * united_n).astype(jnp.int32)
            r2 = jnp.floor(jax.random.uniform(ks[7], (p,), jnp.float64)
                           * united_n).astype(jnp.int32)
            # difference condition (`:256-265`) relaxed to index inequality +
            # one redraw (duplicate rows make the diff term zero, a no-op)
            r2 = jnp.where(r2 == r1, (r2 + 1) % united_n, r2)
            x1 = united_row(r1)
            x2 = united_row(r2)
            x = population
            fb = f[:, None].astype(x.dtype)
            cross_vec = x + fb * (p_best - x) + fb * (x1 - x2)

            # --- branch: binomial crossover / mover-move (`:274-322`)
            u_branch = jax.random.uniform(ks[8], (p, 2), jnp.float64)
            mask = (
                jax.random.uniform(ks[9], (p, v), jnp.float32)
                < cr[:, None].astype(jnp.float32)
            )
            binomial_child = jnp.where(mask, cross_vec, x)
            moved, _ = moves.move_population(ks[10], cross_vec, vm, cfg,
                                             state["tabu"])
            use_move = (u_branch[:, 0] >= 0.5) & (u_branch[:, 1] <= mp)
            candidates = jnp.where(use_move[:, None], moved, binomial_child)

            # --- guarantee_of_change_size forced columns (`:325-334`)
            if g_size > 0:
                kg1, kg2 = jax.random.split(ks[11])
                cnt = jax.random.randint(kg1, (p,), 1, g_size + 1)
                gsel = jax.random.uniform(kg2, (p, v), jnp.float32)
                order = jnp.argsort(gsel, axis=1)
                rank = jnp.argsort(order, axis=1)
                force = rank < cnt[:, None]
                candidates = jnp.where(force, cross_vec, candidates)

            candidates = vm.fix_all(candidates)
            cand_scores = score_fn(candidates)
            cand_prio = _priority(cand_scores)

            # --- replacement + archive push (`build_updated_population`,
            # `lshade_base.rs:351-409`)
            improved = cand_prio < prev_prio
            accepted = cand_prio <= prev_prio
            new_pop = jnp.where(accepted[:, None], candidates, population)
            new_scores = jnp.where(accepted[:, None], cand_scores, scores)

            slot = (
                state["arc_count"]
                + jnp.cumsum(improved).astype(jnp.int32)
                - improved.astype(jnp.int32)
            )
            slot = jnp.where(improved & (slot < cap), slot, cap)
            archive = state["archive"].at[slot].set(candidates, mode="drop")
            arc_f = state["arc_f"].at[slot].set(f, mode="drop")
            arc_cr = state["arc_cr"].at[slot].set(cr, mode="drop")
            arc_ids = state["arc_ids"].at[slot].set(
                jnp.arange(p, dtype=jnp.int32), mode="drop")
            arc_count = jnp.minimum(
                state["arc_count"] + jnp.sum(improved).astype(jnp.int32), cap
            ).astype(jnp.int32)

            # --- random memory pruning (`:376-404`)
            need_prune = arc_count > h
            kp = jax.random.fold_in(key, 1337)
            noise = jax.random.uniform(kp, (cap,), jnp.float64)
            live = jnp.arange(cap) < arc_count
            keep_rank = jnp.argsort(jnp.argsort(jnp.where(live, noise, 2.0)))
            keep = live & (keep_rank < keep_after_prune)
            keep = jnp.where(need_prune, keep, live)
            # stable compaction: kept rows first, original order preserved
            order = jnp.argsort(~keep, stable=True)
            archive = archive[order]
            arc_f, arc_cr, arc_ids = arc_f[order], arc_cr[order], arc_ids[order]
            arc_count = jnp.where(need_prune,
                                  jnp.minimum(arc_count, keep_after_prune),
                                  arc_count).astype(jnp.int32)

            # --- weighted Lehmer-mean adaptation (`adapt_parameters`, `:146-183`)
            hist_live = jnp.arange(cap) < arc_count
            new_prio_at = _priority(new_scores)[jnp.clip(arc_ids, 0, p - 1)]
            old_prio_at = prev_prio[jnp.clip(arc_ids, 0, p - 1)]
            deltas = jnp.where(hist_live, jnp.abs(new_prio_at - old_prio_at), 0.0)
            sum_d = jnp.sum(deltas)
            w = jnp.where(sum_d == 0.0, 0.0, deltas / jnp.where(sum_d == 0.0, 1.0, sum_d))

            def lehmer(vals):
                num = jnp.sum(w * vals * vals * hist_live)
                den = jnp.sum(w * vals * hist_live)
                return jnp.where(den == 0.0, 0.0, num / jnp.where(den == 0.0, 1.0, den))

            new_cr_k = lehmer(arc_cr)
            new_f_k = lehmer(arc_f)
            has_hist = arc_count > 0
            k_idx = state["k"]
            adaptive_cr = state["adaptive_cr"].at[k_idx].set(
                jnp.where(has_hist,
                          jnp.where(new_cr_k > 0.0, new_cr_k, self.initial_cr),
                          state["adaptive_cr"][k_idx]))
            adaptive_mp = state["adaptive_mp"].at[k_idx].set(
                jnp.where(has_hist, 1.0 - new_cr_k, state["adaptive_mp"][k_idx]))
            adaptive_f = state["adaptive_f"].at[k_idx].set(
                jnp.where(has_hist,
                          jnp.where(new_f_k > 0.0, new_f_k, self.initial_f),
                          state["adaptive_f"][k_idx]))
            k_next = jnp.where(has_hist, (k_idx + 1) % h, k_idx)

            new_scores, new_pop = lexico.lex_sort_scores_with(new_scores, new_pop)
            state = dict(state)
            state.update(
                population=new_pop, scores=new_scores, archive=archive,
                arc_f=arc_f, arc_cr=arc_cr, arc_ids=arc_ids,
                arc_count=arc_count, adaptive_f=adaptive_f,
                adaptive_cr=adaptive_cr, adaptive_mp=adaptive_mp, k=k_next,
            )
            state = base.update_top(state)
            state["step_id"] = state["step_id"] + 1
            return state

        return base.MetaheuristicKernel(self, init_state, step, path="plain",
                                        moves_per_step=self.population_size)
