"""N-Queens cotwin + TPU score kernels.

Reference: `/root/reference/examples/nqueens/src/persistence/
cotwin_builder.rs:40-94` (one GJInteger row per queen, bounds 0..n-1) and
`score/plain_score_calculator.rs:26-67` — the fused `all_different`
constraint: per sample, (len - n_unique) over rows, descending (col+row)
and ascending (col-row) diagonals. The Polars group_by/n_unique becomes a
bincount kernel (`ops.segments.count_minus_n_unique`) vmapped over the
population.
"""

from __future__ import annotations

from greyjack_tpu.cotwin import Cotwin, CotwinBuilderBase
from greyjack_tpu.variables import GJInteger
from greyjack_tpu.score_calculation.scores import SimpleScore
from greyjack_tpu.score_calculation.score_calculators import (
    PlainScoreCalculator,
    IncrementalScoreCalculator,
)
from greyjack_tpu.ops import segments


class CotQueen:
    def __init__(self, queen_id, row_id, column_id):
        self.queen_id = queen_id
        self.row_id = row_id
        self.column_id = column_id

    def to_vec(self):
        return [
            ("queen_id", self.queen_id),
            ("row_id", self.row_id),
            ("column_id", self.column_id),
        ]


def all_different(planning, facts, utils):
    queens = planning["queens"]
    rows = queens["row_id"]
    cols = queens["column_id"]
    n = rows.shape[0]
    row_conflicts = segments.count_minus_n_unique(rows, n)
    desc_conflicts = segments.count_minus_n_unique(cols + rows, 2 * n - 1)
    asc_conflicts = segments.count_minus_n_unique(cols - rows + (n - 1), 2 * n - 1)
    return (row_conflicts + desc_conflicts + asc_conflicts,)


class CotwinBuilder(CotwinBuilderBase):
    def __init__(self, use_incremental_score_calculation=True):
        self.use_incremental_score_calculation = use_incremental_score_calculation

    def build_cotwin(self, domain, is_already_initialized):
        n = domain.n
        cot_queens = []
        for i, queen in enumerate(domain.queens):
            cot_queens.append(
                CotQueen(
                    queen_id=i,
                    row_id=GJInteger(queen.row_id, 0, n - 1, False, None),
                    column_id=queen.column_id,
                )
            )

        cotwin = Cotwin()
        cotwin.add_planning_entities("queens", cot_queens)

        calc_cls = (
            IncrementalScoreCalculator
            if self.use_incremental_score_calculation
            else PlainScoreCalculator
        )
        calculator = calc_cls(SimpleScore)
        calculator.add_constraint("all_different", all_different)
        cotwin.add_score_calculator(calculator)
        return cotwin
