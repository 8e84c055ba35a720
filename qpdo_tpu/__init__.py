"""qpdo_tpu — a TPU-native convex QP solver framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference QPDO solver (primal-dual Newton proximal method, De Marchi 2022):
semismooth Newton on the regularized KKT system, exact piecewise-linear
linesearch, Ruiz equilibration, adaptive proximal/penalty parameters,
warm starting, parametric updates, and primal/dual infeasibility
certificates — batched with ``vmap`` and sharded across TPU meshes.
"""

from . import applications, constants
from .constants import (
    SOLVED, NON_CVX, PRIMAL_INFEASIBLE, DUAL_INFEASIBLE,
    MAX_ITER_REACHED, MAX_TIME_REACHED, UNSOLVED, QPDO_INFTY,
)
from .types import Problem, Settings, Info, Result, ScaledProblem, SolverState
from .api import (solve, solve_sparse, solve_sparse_batch,
                  solve_sparse_heterogeneous, make_problem, QPDO)
from .continuation import solve_continuation, grid1d_prolong, grid2d_interp
from .diff import qp_solve, sparse_qp_layer
from .solver.scaling import scale_problem
from .solver.core import solve_scaled

__version__ = "0.1.0"

__all__ = [
    "Problem", "Settings", "Info", "Result", "ScaledProblem", "SolverState",
    "solve", "solve_sparse", "solve_sparse_batch",
    "solve_sparse_heterogeneous", "make_problem", "QPDO", "scale_problem", "solve_scaled", "qp_solve", "sparse_qp_layer",
    "solve_continuation", "grid1d_prolong", "grid2d_interp",
    "SOLVED", "NON_CVX", "PRIMAL_INFEASIBLE", "DUAL_INFEASIBLE",
    "MAX_ITER_REACHED", "MAX_TIME_REACHED", "UNSOLVED", "QPDO_INFTY",
    "applications", "constants",
]
