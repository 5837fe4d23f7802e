"""Device-side compute kernels: assembly, dense solves, sparse CG, stencils."""

from nodal_tpu.ops.assemble import assemble_dense, assemble_rhs  # noqa: F401
from nodal_tpu.ops.dense_solve import solve_dense  # noqa: F401
