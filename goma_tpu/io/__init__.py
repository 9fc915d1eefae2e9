from goma_tpu.io.checkpoint import load_checkpoint, mesh_fingerprint, save_checkpoint
from goma_tpu.io.exodus import read_exodus, write_exodus
from goma_tpu.io.netcdf3 import Dataset
from goma_tpu.io.pixel import image_to_nodal_field, read_pgm
