"""Sources & sinks: the files-table reader, deterministic synthetic corpus
generator, documents-table adapter, and the JSON model/config store
(SURVEY.md §2.1)."""
