"""Engine operators (each module documents which reference op it generalizes)."""
