"""Column-level helpers: vocabularies, render joins, HTML strip, text stats, metrics."""
