from pubmed_and_method_spark.sources.datagen import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    generate_transcripts,
)
