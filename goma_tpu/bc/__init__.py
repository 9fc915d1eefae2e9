from goma_tpu.bc.free_surface import CapillaryBC, KinematicBC, NormalFlux, Traction
