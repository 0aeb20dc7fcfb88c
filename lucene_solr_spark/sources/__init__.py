from .transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    gen_transcripts_df,
    gen_transcripts_pdf,
)
