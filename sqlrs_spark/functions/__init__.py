"""placeholder — filled in by subsequent commits."""
