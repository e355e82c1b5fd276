"""Per-feature snap kernel (pointindex + snap), pure Python + numpy."""
