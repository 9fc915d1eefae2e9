from goma_tpu.mesh.mesh import Block, Mesh, SideSet
from goma_tpu.mesh.generators import box_mesh, rectangle_mesh
from goma_tpu.mesh.immersed import circle_block, polyline_block
