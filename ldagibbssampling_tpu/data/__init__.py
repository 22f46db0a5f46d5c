"""Data assets: stand-in mini-corpus generator + reference parameter file.

The reference bundles a small plain-text example corpus under
``data/LdaOriginalDocs/`` and a tab-separated parameter file (SURVEY.md §2.1
#8-#9); neither is available on this machine (the reference mount is empty —
SURVEY.md §0, §7 hard-part 6), so :mod:`minicorpus` generates a deterministic
stand-in with the same statistical shape.
"""

from ldagibbssampling_tpu.data.minicorpus import generate_minicorpus, write_minicorpus

__all__ = ["generate_minicorpus", "write_minicorpus"]
