from goma_tpu.mesh.mesh import Block, Mesh, SideSet
from goma_tpu.mesh.generators import box_mesh, rectangle_mesh
