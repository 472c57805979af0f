from .mesh import (make_mesh, shard_batch, replicate,  # noqa: F401
                   sharded_transcode_step)
from .serving import (ShardedJpegPipeline, ShardedStillPipeline,  # noqa: F401
                      transcode_sharded)
