from goma_tpu.post.postproc import (
    flow_rate,
    heat_flux,
    sideset_integral,
    stream_function,
    traction_integrand,
    volume_integral,
)
from goma_tpu.post.stats import format_stats, variable_stats
