"""Segment/uniqueness kernels — the TPU replacements for the reference's
Polars group_by/agg idioms (SURVEY.md §7.1(2)).

All kernels are fixed-shape, vmap-friendly and avoid hash tables: group keys
in cotwin problems are dense small integers (queen rows, location ids,
vehicle ids), so `len - n_unique` penalties become bincount comparisons and
joins become gathers.
"""

import jax
import jax.numpy as jnp


def count_minus_n_unique(values, num_buckets):
    """`len(values) - n_unique(values)` for dense int values in [0, num_buckets).

    Replaces Polars `col.len() - col.n_unique()` (nqueens
    `plain_score_calculator.rs:44-48`, tsp `plain_score_calculator.rs:46`).
    values: int[N] -> f64 scalar.
    """
    counts = jnp.bincount(values, length=num_buckets)
    n_unique = jnp.sum(counts > 0)
    return (values.shape[0] - n_unique).astype(jnp.float64)


def n_unique(values, num_buckets):
    counts = jnp.bincount(values, length=num_buckets)
    return jnp.sum(counts > 0)


def segment_sum(values, segment_ids, num_segments):
    """Sum `values` per segment id. Replaces `group_by(key).agg(sum)`."""
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def segment_count(segment_ids, num_segments):
    return jnp.bincount(segment_ids, length=num_segments)


def overflow_penalty(demands, segment_ids, capacities, num_segments):
    """Capacity-overflow penalty: sum over segments of max(0, load - cap).

    Replaces the VRP capacity constraint join+filter+agg
    (`examples/vrp/src/score/plain_score_calculator.rs:95-107`).
    """
    loads = segment_sum(demands, segment_ids, num_segments)
    over = jnp.maximum(loads - capacities, 0)
    return jnp.sum(over).astype(jnp.float64)
