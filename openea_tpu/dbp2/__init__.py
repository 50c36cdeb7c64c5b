"""DBP2.0 dangling-entity alignment (reference /root/reference/dbp2.0/)."""
