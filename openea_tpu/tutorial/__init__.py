"""Course-lab utilities (reference /root/reference/tutorial/)."""
