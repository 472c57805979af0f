from .mesh import (make_mesh, shard_batch, replicate,  # noqa: F401
                   sharded_transcode_step)
from .serving import ShardedJpegPipeline, transcode_sharded  # noqa: F401
