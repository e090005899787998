"""c3poa_tpu — a TPU-native R2C2 concatemeric consensus engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of C3POa
(reference: /root/reference, rvolden/C3POa v2.2.3): calling high-accuracy
consensus sequences from R2C2 rolling-circle nanopore reads, plus adapter
trimming, reorientation and index demultiplexing.

Instead of the reference's per-read CPU pipeline (BLAT + conk splint scoring,
scipy peak calling, abPOA partial-order consensus, racon polish, orchestrated
with multiprocessing + temp files), every compute stage here is a batched,
length-bucketed TPU kernel:

- ``kernels.sw_profile``  — batched local-alignment score profiles locating
  splints/adapters (replaces conk ``C3POa.py:123`` and both BLAT roles
  ``bin/preprocess.py:74`` / ``C3POa_postprocessing.py:232``)
- ``kernels.smooth`` + ``kernels.peaks`` — masked Savitzky-Golay smoothing and
  vectorised peak calling (replaces ``bin/call_peaks.py``)
- ``kernels.banded``  — banded affine-gap aligner with move emission; the
  consensus engine iterates align→vote rounds (replaces abPOA + racon,
  ``bin/determine_consensus.py``)
- ``kernels.levenshtein`` — sliding edit-distance index demux
  (replaces editdistance, ``C3POa_postprocessing.py:266``)

``ref/`` holds pure-numpy reference implementations of each algorithm: they
are the executable spec the TPU kernels are tested against bit-for-bit.
"""

__version__ = "0.1.0"
