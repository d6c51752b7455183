from dlwpbench_tpu.grids.latlon import LatLonGrid, weatherbench_grid
from dlwpbench_tpu.grids import healpix
