"""Pure-Python extraction + comparison kernel (no Ray imports).

Single source of truth for the semantics the distributed pipeline must
reproduce.  Every module here is deterministic and import-time-compiled so it
can be used directly inside ``map_batches`` UDFs and actor ``__init__``.
"""

from .normalizer import normalize, normalize_array
from .extract import extract, ExtractionKernel
from .compare import compare_components, score_pair
