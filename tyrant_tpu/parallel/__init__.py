from .sharded import (ShardedRenderer, assemble_image, init_sharded_state,  # noqa: F401
                      make_mesh, make_sharded_step)
