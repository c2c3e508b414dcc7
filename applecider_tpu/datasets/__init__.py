"""Host-plane datasets: ragged on-disk artifacts -> fixed-shape device batches.

* ``oversampler``             — class-imbalance oversampling index maps
* ``photo_dataset``           — photometry event sequences (pad/mask to 257)
* ``image_metadata_dataset``  — per-alert cutout triplets + 24-col metadata
* ``spectra_dataset``         — fixed-grid spectra tables
* ``fusion_dataset``          — all four modalities per object
* ``loader``                  — seeded shuffling batcher with prefetch
"""
