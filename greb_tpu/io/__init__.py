"""Binary/namelist IO, synthetic forcing, checkpointing."""
