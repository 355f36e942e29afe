"""L6 I/O layer: settings files, dataset loaders, trajectory export,
checkpointing (reference: Examples/* drivers + cv::FileStorage YAML
parsing in src/Tracking.cc:~55-180; checkpointing is a capability the
reference lacks, SURVEY.md section 5.4)."""
