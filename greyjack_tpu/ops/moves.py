"""The batched move library — TPU redesign of the reference `Mover`.

Reference (`greyjack/src/agents/metaheuristic_bases/mover.rs`): six move
types chosen by cumulative probability thresholds, operating on a random
semantic group, with per-group entity tabu and a Binomial change-count.
Every metaheuristic shares this library.

TPU-first formulation: every move is a *permutation-with-resampling* of the
values at the chosen group's variable slots, so all six reduce to one
gather + one scatter over the group-member table:

    src_pos[Lmax]   - group position whose value flows into each position
    resample[Lmax]  - positions whose value is re-drawn from U[lb, ub)
    active[Lmax]    - positions actually written

The per-candidate kernel computes the (cheap, [Lmax]-sized) mapping for all
six move types and selects by drawn move id, then applies one scatter into
the full chromosome. Under `vmap` the whole population moves in one fused
kernel — there is no per-candidate host loop anywhere.

Documented divergences from the reference (search-behavior only; score
functions are unaffected — SURVEY.md §7.3):
  * change-counts are capped at `config.MAX_MOVE_SIZE` (reference draws
    Binomial(n_vars, rate), which exceeds 8 with negligible probability at
    the default mutation rates);
  * `scramble` applies a uniformly random permutation of the window instead
    of the reference's sequential swap composition (`mover.rs:301-313`);
  * `insertion` uses the clean subrange rotation (the reference's
    *incremental* semantics, `mover.rs:362-369`; its plain path applies an
    extra wrap-around swap);
  * overlapping edges in `swap_edges` resolve by scatter order instead of
    sequential swap order;
  * entity tabu is a functional ring buffer updated once per step from the
    sampled positions (Gumbel-penalty avoidance) instead of a FIFO mutated
    mid-sampling.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from greyjack_tpu import config
from greyjack_tpu.ops import selection
from greyjack_tpu.utils.math_utils import round_decimal


def default_move_thresholds():
    """Reference default: six equal probabilities rounded to 3 decimals, the
    remainder folded into the first (`mover.rs:38-49`)."""
    inc = [round_decimal(1.0 / 6.0, 3)] * 6
    inc[0] += 1.0 - sum(inc)
    thresholds = np.cumsum(inc)
    return thresholds


def thresholds_from_probas(move_probas):
    probas = list(move_probas)
    assert len(probas) == 6, "move_probas must have 6 entries"
    assert abs(sum(probas) - 1.0) < 1e-6, "move_probas must sum to 1.0"
    return np.cumsum(probas)


class MoverConfig:
    """Static (host-side) move configuration shared by all metaheuristics.

    Mirrors the reference Mover construction (`mover.rs:26-73`) plus the
    per-group mutation rates each metaheuristic base computes
    (`genetic_algorithm_base.rs:59-64`).
    """

    def __init__(self, variables_manager, tabu_entity_rate=0.0,
                 mutation_rate_multiplier=None, move_probas=None):
        vm = variables_manager
        if move_probas is None:
            thr = default_move_thresholds()
        else:
            thr = thresholds_from_probas(move_probas)
        self.thresholds = jnp.asarray(thr, dtype=jnp.float64)
        self.tabu_entity_rate = float(tabu_entity_rate)

        mult = 0.0 if mutation_rate_multiplier is None else float(mutation_rate_multiplier)
        sizes = np.maximum(vm.group_sizes_np, 1)
        self.group_rates = jnp.asarray(mult / sizes, dtype=jnp.float64)
        # tabu size per group = max(ceil(rate * len), 1) (`tabu_search_base.rs:91`)
        self.tabu_sizes = jnp.asarray(
            np.minimum(
                np.maximum(np.ceil(tabu_entity_rate * sizes), 1).astype(np.int32),
                config.MAX_TABU_SIZE,
            )
        )
        self.use_tabu = tabu_entity_rate > 0.0
        self.n_groups = vm.n_semantic_groups
        self.max_group_size = vm.max_group_size

    def init_tabu_state(self):
        cap = min(config.MAX_TABU_SIZE, max(2, self.max_group_size))
        return selection.make_tabu_state(max(1, self.n_groups), cap)


def do_move(key, candidate, vm, cfg: MoverConfig, tabu_state):
    """Apply one randomly-drawn move to one candidate.

    candidate: f64[V]. Returns (new_candidate, info) where info carries the
    touched group/positions for the per-step tabu update. Designed to be
    vmapped over the population axis.
    """
    k_max = config.MAX_MOVE_SIZE
    lmax = cfg.max_group_size
    (k_move, k_group, k_count, k_sel, k_len, k_start, k_perm, k_res) = \
        jax.random.split(key, 8)

    u_move = jax.random.uniform(k_move, (), dtype=jnp.float64)
    move_type = jnp.sum(cfg.thresholds < u_move).astype(jnp.int32)

    g = jax.random.randint(k_group, (), 0, max(1, cfg.n_groups))
    length = vm.group_sizes[g].astype(jnp.int32)
    members = vm.group_members[g]
    rate = cfg.group_rates[g]

    # Binomial(n_vars, rate) change count (`mover.rs:130-143`)
    c_raw = jnp.sum(
        jax.random.uniform(k_count, (vm.variables_count,), dtype=jnp.float32)
        < rate.astype(jnp.float32)
    ).astype(jnp.int32)

    # per-move-type effective counts / no-op flags
    c_change = jnp.clip(jnp.maximum(c_raw, 1), 1, k_max)
    c_swap = jnp.clip(jnp.maximum(c_raw, 2), 2, k_max)
    c_edges = jnp.clip(jnp.maximum(c_raw, 2), 2, jnp.maximum(jnp.minimum(length - 1, k_max), 2))
    k_scr = jax.random.randint(k_len, (), config.SCRAMBLE_MIN, config.SCRAMBLE_MAX + 1)

    is_edges = move_type == 2
    sel_limit = jnp.where(is_edges, length - 1, length)
    tabu_mask = None
    if cfg.use_tabu:
        tabu_mask = selection.tabu_mask_for_group(tabu_state, g, cfg.tabu_sizes, lmax)
    sel = selection.gumbel_topk_positions(k_sel, sel_limit, k_max, tabu_mask, lmax)

    # scramble window start in [0, length - k_scr) (`mover.rs:294-299`)
    start_limit = jnp.maximum(length - k_scr, 1)
    start = selection.gumbel_topk_positions(k_start, start_limit, 1, tabu_mask, lmax)[0]

    idx = jnp.arange(lmax, dtype=jnp.int32)
    identity = idx
    ii = jnp.arange(k_max, dtype=jnp.int32)
    oob = jnp.asarray(lmax, jnp.int32)

    def cyc_scatter(base, targets, cnt, offset=0):
        """base.at[targets_i + offset] = targets_{(i+1)%cnt} + offset, i<cnt."""
        nxt = targets[(ii + 1) % jnp.maximum(cnt, 1)]
        tgt = jnp.where(ii < cnt, targets + offset, oob)
        return base.at[tgt].set(nxt + offset, mode="drop")

    def act_scatter(base, targets, cnt, offset=0):
        tgt = jnp.where(ii < cnt, targets + offset, oob)
        return base.at[tgt].set(True, mode="drop")

    false_l = jnp.zeros((lmax,), bool)

    # --- 0: change — resample selected positions (`mover.rs:145-177`)
    act0 = act_scatter(false_l, sel, c_change)
    noop0 = length < c_change
    # --- 1: swap — left-rotate values at selected positions (`mover.rs:179-216`)
    src1 = cyc_scatter(identity, sel, c_swap)
    act1 = act_scatter(false_l, sel, c_swap)
    noop1 = length < c_swap
    # --- 2: swap_edges (`mover.rs:218-278`): edges e_i = (sel_i, sel_i+1)
    # rotated left, then chained pairwise swaps. Simulated as the exact
    # sequential swap composition on an index array so overlapping edges
    # still compose to a permutation (multiset-preserving).
    def mswap(q, a, b, en):
        va, vb = q[a], q[b]
        q = q.at[a].set(jnp.where(en, vb, va))
        return q.at[b].set(jnp.where(en, va, vb))

    src2 = identity
    for i in range(1, k_max):
        en = i < c_edges
        prev_e = sel[(i - 1 + 1) % jnp.maximum(c_edges, 1)]  # rotated: r_{i-1} = e_i
        cur_e = sel[(i + 1) % jnp.maximum(c_edges, 1)]       # r_i = e_{(i+1)%c}
        src2 = mswap(src2, prev_e, cur_e, en)
        src2 = mswap(src2, prev_e + 1, cur_e + 1, en)
    act2 = act_scatter(act_scatter(false_l, sel, c_edges, 0), sel, c_edges, 1)
    noop2 = length < 3
    # --- 3: scramble — random permutation of window [start, start+k) (`mover.rs:280-316`)
    perm = selection.random_permutation_positions(k_perm, config.SCRAMBLE_MAX, k_scr)
    jj = jnp.arange(config.SCRAMBLE_MAX, dtype=jnp.int32)
    w_tgt = jnp.where(jj < k_scr, start + jj, oob)
    src3 = identity.at[w_tgt].set(start + perm, mode="drop")
    act3 = false_l.at[w_tgt].set(True, mode="drop")
    noop3 = length <= k_scr
    # --- 4: insertion — rotate subrange [a, b] toward a (`mover.rs:318-375`)
    a, b = sel[0], sel[1]
    lo, hi = jnp.minimum(a, b), jnp.maximum(a, b)
    in_range = (idx >= lo) & (idx <= hi)
    src_left = jnp.where(idx == hi, lo, idx + 1)
    src_right = jnp.where(idx == lo, hi, idx - 1)
    src4 = jnp.where(in_range, jnp.where(a < b, src_left, src_right), identity)
    act4 = in_range
    noop4 = (length <= 1) | (a == b)
    # --- 5: inverse — reverse subrange values (`mover.rs:377-421`)
    src5 = jnp.where(in_range, lo + hi - idx, identity)
    act5 = in_range
    noop5 = (length <= 1) | (a == b)

    srcs = jnp.stack([identity, src1, src2, src3, src4, src5])
    acts = jnp.stack([act0, act1, act2, act3, act4, act5])
    noops = jnp.stack([noop0, noop1, noop2, noop3, noop4, noop5])

    src_pos = srcs[move_type]
    active = acts[move_type] & ~noops[move_type] & (idx < length)
    resample = jnp.where(move_type == 0, active, false_l)

    member_ids = members
    src_ids = members[jnp.clip(src_pos, 0, lmax - 1)]
    moved_vals = candidate[src_ids]
    u = jax.random.uniform(k_res, (lmax,), dtype=candidate.dtype)
    lo_b = vm.lower_bounds[member_ids].astype(candidate.dtype)
    hi_b = vm.upper_bounds[member_ids].astype(candidate.dtype)
    random_vals = lo_b + u * (hi_b - lo_b)
    new_vals = jnp.where(resample, random_vals, moved_vals)

    v_oob = jnp.asarray(vm.variables_count, member_ids.dtype)
    scatter_ids = jnp.where(active, member_ids, v_oob)
    new_candidate = candidate.at[scatter_ids].set(new_vals, mode="drop")

    # tabu bookkeeping info: positions this move consumed
    tabu_positions = jnp.where(move_type == 3, start * jnp.ones_like(sel), sel)
    tabu_count = jnp.where(
        move_type == 3, 1,
        jnp.stack([c_change, c_swap, c_edges, jnp.int32(1), jnp.int32(2), jnp.int32(2)])[move_type],
    )
    info = {"group": g, "positions": tabu_positions, "count": tabu_count}
    return new_candidate, info


def move_population(key, population, vm, cfg: MoverConfig, tabu_state):
    """Vmapped `do_move` over a population f64[P, V].

    `vm`/`cfg` are static schema holders (closed over); `tabu_state` is a
    shared (unbatched) pytree.
    """
    p = population.shape[0]
    keys = jax.random.split(key, p)

    def one(k, c, ts):
        return do_move(k, c, vm, cfg, ts)

    return jax.vmap(one, in_axes=(0, 0, None))(keys, population, tabu_state)


def update_tabu_from_info(tabu_state, info, sample_idx):
    """Push one candidate's touched positions into the group ring."""
    g = info["group"][sample_idx]
    positions = info["positions"][sample_idx]
    count = info["count"][sample_idx]
    return selection.tabu_push(tabu_state, g, positions, count)
