from goma_tpu.solvers.linear import BlockJacobi, bicgstab, direct_solve_host, gmres
from goma_tpu.solvers.newton import NewtonOptions, NewtonResult, NewtonSolver
from goma_tpu.solvers.projection import ProjectionResult, ProjectionSolver
