from .normalize import normalize_stage
from .extract import ExtractTurns, extract_stage, dedup_extract_stage
from .blocking import blocking_stage
from .pairs import candidate_pairs_stage
from .scoring import score_pairs_stage
from .unionfind import connected_components
