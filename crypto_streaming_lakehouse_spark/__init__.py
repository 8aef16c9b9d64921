"""PySpark-native analytics engine with the query and data-processing
capabilities of the crypto-streaming-lakehouse reference.

Layout (SURVEY.md §7):
  session     SparkSession factory with the scale-aware defaults
  schemas     declared StructTypes for every layer (SURVEY.md §1.2)
  sources     fixture-table loaders + role-mapping views
  functions   scalar/column function library (symbols, time, text, vectors)
  operators   batch relational operators (bars, analysis, relational)
  streaming   bronze→silver→gold Structured Streaming pipeline
  extensions  training-data-pipeline ops (dedup, similarity, text, multimodal)
  plans       explain/plan-inspection helpers
"""

__version__ = "0.1.0"

# Importing the package assembles the full query registry: registry defines
# the core operators, registry_ext adds the training-data-pipeline queries.
from . import registry as _registry  # noqa: E402,F401
from . import registry_breadth as _registry_breadth  # noqa: E402,F401
from . import registry_ext as _registry_ext  # noqa: E402,F401
from . import registry_llm as _registry_llm  # noqa: E402,F401
from . import registry_patterns as _registry_patterns  # noqa: E402,F401
from . import registry_sql as _registry_sql  # noqa: E402,F401
from . import registry_quant as _registry_quant  # noqa: E402,F401
from . import registry_round2 as _registry_round2  # noqa: E402,F401
from . import registry_round3 as _registry_round3  # noqa: E402,F401
from . import registry_round3b as _registry_round3b  # noqa: E402,F401
from . import registry_round4 as _registry_round4  # noqa: E402,F401
from . import registry_round5 as _registry_round5  # noqa: E402,F401
from . import registry_round6 as _registry_round6  # noqa: E402,F401
from . import registry_round7 as _registry_round7  # noqa: E402,F401
from . import registry_round7b as _registry_round7b  # noqa: E402,F401
from . import registry_round7c as _registry_round7c  # noqa: E402,F401
from . import registry_round7d as _registry_round7d  # noqa: E402,F401
from . import registry_round7e as _registry_round7e  # noqa: E402,F401
from . import registry_round8 as _registry_round8  # noqa: E402,F401
from . import registry_round9 as _registry_round9  # noqa: E402,F401
from . import registry_round10 as _registry_round10  # noqa: E402,F401
from . import registry_round11 as _registry_round11  # noqa: E402,F401
from . import registry_round12 as _registry_round12  # noqa: E402,F401
from . import registry_round12b as _registry_round12b  # noqa: E402,F401
from . import registry_round13 as _registry_round13  # noqa: E402,F401
from . import registry_round14 as _registry_round14  # noqa: E402,F401
from . import registry_tpch as _registry_tpch  # noqa: E402,F401
