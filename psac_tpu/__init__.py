"""psac_tpu — TPU-native suffix array / LCP / suffix tree / DESA framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of patflick/psac
(distributed suffix-array + LCP construction via k-mer initial ranking and
prefix doubling, ANSV + suffix trees, generalized suffix arrays over string
sets, and the DESA distributed pattern-matching index), built TPU-first:

- the text is block-sharded over a 1-D ``jax.sharding.Mesh`` axis
  (the TPU-native equivalent of the reference's ``mxx::blk_dist``,
  cf. reference ``include/dvector.hpp``),
- the shift / sort / rebucket / permute phases of the doubling loop are
  ``jax.lax`` collectives (``ppermute``, all-to-all, distributed bitonic
  sort, segmented scans) under ``jax.shard_map``,
- per-shard hot loops are XLA-fused vector ops (Pallas kernels where XLA
  falls short),
- everything under jit uses static shapes; dynamic early-exit decisions are
  staged from the host on O(1) scalars.

See SURVEY.md for the structural map of the reference this re-implements.
"""

import os as _os

if _os.environ.get("PSAC_NO_COMPILE_CACHE", "0") in ("", "0"):
    # first compiles of the shard_map steps take tens of seconds; persist
    # them across processes (opt out with PSAC_NO_COMPILE_CACHE=1)
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/jax_psac"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

from psac_tpu.models.suffix_array import SuffixArray, build_suffix_array  # noqa: F401
from psac_tpu.models.suffix_tree import build_suffix_tree  # noqa: F401
from psac_tpu.models.desa import DESA, build_desa  # noqa: F401
