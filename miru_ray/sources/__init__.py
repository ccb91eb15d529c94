"""Input adapters: synthetic pages fixtures + driver-testdata mapping."""
