"""Console entry points (the reference's harana-* scripts, setup.py:60-76)."""
