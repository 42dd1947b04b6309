"""Reference xpacks/llm — operator analogues (reference xpacks/llm/*.py).

splitters / embedders / parsers / rerankers are the in-engine modules;
``vector_document_index`` / ``DataIndex`` come from the indexing layer.
"""

from pathwaydataframework_spark.operators import (  # noqa: F401
    embedders,
    parsers,
    rerankers,
    splitters,
)
from pathwaydataframework_spark.operators.ml_index import (  # noqa: F401
    DataIndex,
    default_vector_document_index,
)
from pathwaydataframework_spark.xpacks.llm.document_store import (  # noqa: F401
    DocumentStore,
    SlidesDocumentStore,
)
from pathwaydataframework_spark.xpacks.llm.vector_store import (  # noqa: F401
    SlidesVectorStoreServer,
    VectorStoreClient,
    VectorStoreServer,
)
from pathwaydataframework_spark.xpacks.llm import (  # noqa: F401
    embedders,
    llms,
    parsers,
    prompts,
    question_answering,
    servers,
)
from pathwaydataframework_spark.xpacks.llm.parsers import (  # noqa: F401
    ImageParser,
    OpenParse,
    ParseUnstructured,
    ParseUtf8,
    PypdfParser,
    SlideParser,
)
from pathwaydataframework_spark.xpacks.llm.embedders import (  # noqa: F401
    BaseEmbedder,
    GeminiEmbedder,
    LiteLLMEmbedder,
    OpenAIEmbedder,
    SentenceTransformerEmbedder,
)
from pathwaydataframework_spark.xpacks.llm.question_answering import (  # noqa: F401
    AdaptiveRAGQuestionAnswerer,
    BaseQuestionAnswerer,
    BaseRAGQuestionAnswerer,
    RAGClient,
    SummaryQuestionAnswerer,
    answer_with_geometric_rag_strategy,
    answer_with_geometric_rag_strategy_from_index,
)

__all__ = [
    "splitters",
    "embedders",
    "parsers",
    "rerankers",
    "DataIndex",
    "default_vector_document_index",
    "DocumentStore",
    "SlidesDocumentStore",
    "VectorStoreServer",
    "SlidesVectorStoreServer",
    "VectorStoreClient",
]
