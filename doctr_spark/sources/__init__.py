"""Sources: payload codecs, the deterministic raster font, synthetic corpus."""
