"""Host-side data pipeline: manifests, dataset adapters, the ring-buffer
batch sampler, augmentation, and device prefetch."""
