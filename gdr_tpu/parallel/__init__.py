"""Device mesh, sharding rules, and distributed retrieval collectives."""
