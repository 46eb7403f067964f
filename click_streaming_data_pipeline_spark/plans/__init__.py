from .registry import QUERIES, CatalogQuery, query, queries_dict, oracle_dict

# importing the catalog modules populates the registry
from . import catalog_core  # noqa: F401
from . import catalog_search  # noqa: F401
from . import catalog_extensions  # noqa: F401
from . import catalog_streaming  # noqa: F401
from . import catalog_relops  # noqa: F401
from . import catalog_scale  # noqa: F401
from . import catalog_temporal  # noqa: F401
from . import catalog_quality  # noqa: F401
from . import catalog_corpus  # noqa: F401
from . import catalog_tpch  # noqa: F401
from . import catalog_clickstream  # noqa: F401
from . import catalog_linkage  # noqa: F401
from . import catalog_robust  # noqa: F401

# late-bind the self-describing manifest's oracle now that every
# catalog module has registered (the VALUES list must cover the full
# registry; CatalogQuery is frozen, so re-register)
from dataclasses import replace as _replace

from .catalog_relops import _manifest_oracle as _mo

QUERIES["catalog_manifest"] = _replace(
    QUERIES["catalog_manifest"], oracle=_mo()
)

__all__ = ["QUERIES", "CatalogQuery", "query", "queries_dict", "oracle_dict"]
