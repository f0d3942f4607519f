"""Raster kernels and codecs (pure numpy + stdlib zlib).

Replaces rasterio/GDAL raster IO and rasterio.features kernels used by
the reference (solaris/vector/mask.py, solaris/tile/raster_tile.py)
with dependency-free implementations suitable for `map_batches` hot
paths.
"""
