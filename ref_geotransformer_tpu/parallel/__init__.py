from ref_geotransformer_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding
from ref_geotransformer_tpu.parallel.dp import shard_batch, all_reduce_mean_dict
