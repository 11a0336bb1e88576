"""Sources & sinks: synthetic corpus generators, raster IO, checkpoints."""
