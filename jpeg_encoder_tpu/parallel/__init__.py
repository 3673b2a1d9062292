"""Scale-out: mesh construction, sharded batch encode, tiled huge-image encode."""
