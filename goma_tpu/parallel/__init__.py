from goma_tpu.parallel.sharding import ShardedProblem
