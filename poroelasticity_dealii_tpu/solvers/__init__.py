"""On-chip solvers: preconditioned CG (lax.while_loop) and the
fixed-stress-split coupled driver."""

from .discretization import Discretization, build_discretization  # noqa: F401
from .cg import cg_solve  # noqa: F401
from .fss import FixedStressSolver  # noqa: F401
