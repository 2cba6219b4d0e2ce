"""CLI entry points (reference `ctpn/`: train_net, demo, demo_pb, generate_pb)."""
