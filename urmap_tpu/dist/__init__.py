from urmap_tpu.dist.sharded import (ShardedMapper, make_mesh,  # noqa: F401
                                    shard_index_tables)
