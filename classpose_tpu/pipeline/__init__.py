"""WSI inference pipeline: tile streaming, device workers, post-processing,
filtering, and export orchestration."""
