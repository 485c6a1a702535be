"""System composition layer (L2/L3): geometry, channels, precoding, AGC,
TX chain, CNC/MCNC receivers and the Monte-Carlo link model."""
