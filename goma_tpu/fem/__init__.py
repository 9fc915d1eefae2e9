from goma_tpu.fem.assembly import Problem
from goma_tpu.fem.dofmap import DofMap, build_dofmap
from goma_tpu.fem.equations import Equation, FaceKernel, SurfaceVars
from goma_tpu.fem.fields import FieldVars
from goma_tpu.fem.sparsity import build_pattern
