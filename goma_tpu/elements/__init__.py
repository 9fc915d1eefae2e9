from goma_tpu.elements.shapes import (
    ElementType,
    Face,
    element_type,
    eval_basis,
    face_rule,
    faces,
    geom_interp,
    interp_local_nodes,
    n_basis,
    volume_rule,
)
from goma_tpu.elements import quadrature
