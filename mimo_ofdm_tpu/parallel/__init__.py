"""Simulation driver / parallelism layer (L4): sharded Monte-Carlo rounds,
stop-criterion loop and parameter-sweep runner."""
