from goma_tpu.physics.fluid import Continuity, Momentum
from goma_tpu.physics.scalar_transport import Energy, Species
from goma_tpu.physics.mesh_motion import EllipticMesh, LinearElasticMesh, PseudoSolidMesh
from goma_tpu.physics import materials
