"""Multi-chip domain decomposition as GSPMD element sharding."""

from .sharding import (ShardedDiscretization, make_device_mesh,  # noqa: F401
                       shard_discretization, shard_grid_discretization)
