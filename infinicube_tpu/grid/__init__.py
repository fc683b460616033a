from infinicube_tpu.grid.grid import Grid, make_grid  # noqa: F401
from infinicube_tpu.grid.build import (  # noqa: F401
    grid_from_points, grid_from_ijk, grid_from_dense, grid_from_keys,
    grid_from_nearest_voxels_to_points, coarsened_grid, subdivided_grid,
    merge_grids, dense_ijk,
)
from infinicube_tpu.grid import ops  # noqa: F401
from infinicube_tpu.grid import keys  # noqa: F401
