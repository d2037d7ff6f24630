"""Worker process for tests/test_multihost.py — one of N jax.distributed
processes forming a DCN-analog CPU cluster. Each process contributes
`--local-devices` virtual CPU devices; the global mesh spans all of them and
one sharded island chunk (shard_map + ppermute migration + all_gather global
best) runs over the full cluster.

Run only via the parent test (env must be set before jax imports).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from greyjack_tpu.parallel import init_distributed, IslandRunner
    from greyjack_tpu.models.nqueens import DomainBuilder, CotwinBuilder
    from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
    from greyjack_tpu.agents import TabuSearch
    from greyjack_tpu.agents.termination_strategies import StepsLimit

    mesh = init_distributed(coordinator_address=args.coordinator,
                            num_processes=args.num_processes,
                            process_id=args.process_id)
    n_devices = len(jax.devices())
    assert n_devices == mesh.shape["islands"]
    assert jax.process_count() == args.num_processes

    domain = DomainBuilder(8, 45).build_domain_from_scratch()
    cotwin = CotwinBuilder(False).build_cotwin(domain, False)
    req = ScoreRequester(cotwin)
    agent = TabuSearch(8, 0.0, True, None, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0],
                       5, StepsLimit(100))
    kernel = agent.build_kernel(req, None)
    runner = IslandRunner(kernel, n_islands=n_devices,
                          migration_frequency=5, mesh=mesh)

    state = runner.init(jax.random.key(0))
    alive = jnp.ones((n_devices,), bool)
    for c in range(2):
        state = runner.run_chunk(state, jax.random.key(1 + c), alive, {}, 5)
    jax.block_until_ready(state)

    # global_score is fully replicated -> addressable on every process
    g = jax.device_get(state["global_score"])
    assert g.shape == (1,)
    assert float(g[0]) < 1.0e30, f"global best never reduced: {g}"
    # step_id advanced on the locally-addressable island shards
    for shard in state["islands"]["step_id"].addressable_shards:
        assert int(jax.device_get(shard.data)[0]) == 10
    print(f"MULTIHOST_OK process={args.process_id} devices={n_devices} "
          f"best={float(g[0])}")


if __name__ == "__main__":
    main()
