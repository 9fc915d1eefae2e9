from goma_tpu.utils.la import det_and_inv
