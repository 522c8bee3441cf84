"""Dataset adapters: per-dataset path discovery over BaseDataset."""
