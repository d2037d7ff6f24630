"""Host-side Individual — API parity with the reference
(`greyjack/src/agents/base/individual.rs:7-59`): chromosome values + score,
totally ordered by score alone. The device hot path never materializes
these; they exist for host-side inspection, observers and tests.
"""

from __future__ import annotations

from functools import total_ordering

import numpy as np


@total_ordering
class Individual:
    def __init__(self, variable_values, score):
        self.variable_values = np.asarray(variable_values, dtype=np.float64)
        self.score = score

    def __eq__(self, other):
        return isinstance(other, Individual) and self.score == other.score

    def __lt__(self, other):
        return self.score < other.score

    def __repr__(self):
        return f"Individual(score={self.score})"

    @classmethod
    def from_state(cls, state, score_class, island=None):
        """Extract the best individual from a runner state pytree."""
        if island is None:
            values = np.asarray(state["global_values"])
            score = score_class.from_row(np.asarray(state["global_score"]))
        else:
            values = np.asarray(state["islands"]["top_values"][island])
            score = score_class.from_row(
                np.asarray(state["islands"]["top_score"][island])
            )
        return cls(values, score)
