"""The warehouse parity layer: dimension seeds, fact builders, and the
full-ETL orchestration — the star schema a user of the reference
(staging → dimensions → facts → datamarts) gets when they switch to
this engine."""
