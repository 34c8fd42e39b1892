from .synthetic import (
    generate_entities,
    generate_transcripts,
    write_transcript_tables,
    synth_dir_for,
)
