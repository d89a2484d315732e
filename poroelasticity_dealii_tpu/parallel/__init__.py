"""Multi-chip domain decomposition as GSPMD element sharding."""

from .ghost import (GhostShardedDiscretization,  # noqa: F401
                    renumber_discretization, shard_discretization_ghost)
from .sharding import (ShardedDiscretization, make_device_mesh,  # noqa: F401
                       shard_discretization, shard_grid_discretization)
