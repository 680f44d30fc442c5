from ahrd_spark.sources.fasta import (  # noqa: F401
    read_query_fasta,
    read_subject_fasta_db,
    read_references_fasta,
)
from ahrd_spark.sources.blast_tabular import read_seq_sim_table  # noqa: F401
from ahrd_spark.sources.goa import read_goa  # noqa: F401
from ahrd_spark.sources.interpro import (  # noqa: F401
    read_interpro_db,
    read_interpro_raw,
)
